"""GPS position ingestion (reference C23, ``src/get_pos.py`` /
``src/get_pos_mobile.py``): turn a position fix into the client's
``-x <lng*1e5> -y <lat*1e5>`` CLI arguments.

Two sources, matching the reference scripts:
  * NMEA ``$GNRMC`` sentences from a serial device (pyserial optional),
  * termux-location JSON (Android).
"""

from __future__ import annotations

import json
import subprocess

__all__ = ["parse_gnrmc", "coords_to_args", "read_serial_position", "read_termux_position"]

SCALE = 100000  # reference multiplies degrees by 1e5


def parse_gnrmc(sentence: str) -> tuple[float, float] | None:
    """$GNRMC lat/lng in decimal degrees, or None if not a valid fix.

    NMEA RMC fields: [3]=lat ddmm.mmmm, [4]=N/S, [5]=lng dddmm.mmmm, [6]=E/W.
    """
    if not sentence.startswith(("$GNRMC", "$GPRMC")):
        return None
    parts = sentence.strip().split(",")
    if len(parts) < 7 or parts[2] != "A":
        return None

    def dm_to_deg(dm: str, width: int) -> float:
        deg = int(dm[:width])
        minutes = float(dm[width:])
        return deg + minutes / 60.0

    lat = dm_to_deg(parts[3], 2)
    if parts[4] == "S":
        lat = -lat
    lng = dm_to_deg(parts[5], 3)
    if parts[6] == "W":
        lng = -lng
    return lat, lng


def coords_to_args(lat: float, lng: float) -> list[str]:
    """Reference output format: -x <lng*1e5> -y <lat*1e5> (ints)."""
    return ["-x", str(int(lng * SCALE)), "-y", str(int(lat * SCALE))]


def read_serial_position(port: str = "/dev/ttyACM0", baud: int = 9600):
    """Blocking read until a valid $GNRMC fix arrives (get_pos.py)."""
    import serial  # optional dependency, as in the reference

    with serial.Serial(port, baud) as ser:
        while True:
            line = ser.readline().decode(errors="replace")
            fix = parse_gnrmc(line)
            if fix:
                return coords_to_args(*fix)


def read_termux_position():
    """termux-location JSON variant (get_pos_mobile.py)."""
    raw = subprocess.run(
        ["termux-location"], capture_output=True, text=True, check=True
    ).stdout
    data = json.loads(raw)
    return coords_to_args(data["latitude"], data["longitude"])
