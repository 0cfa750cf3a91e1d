"""Utils: hex codec, bit length, CSV writer, printers, GPS parsing."""

import io

from pplp_tpu.utils import get_bitlen, hex_string_to_uint, uint64_to_hex_string
from pplp_tpu.utils.csvwriter import CSVWriter
from pplp_tpu.utils.gps import coords_to_args, parse_gnrmc
from pplp_tpu.utils.printing import print_parameters, print_vector


def test_hex_codec_seal_format():
    assert uint64_to_hex_string(17) == "11"
    assert uint64_to_hex_string(0) == "0"
    assert uint64_to_hex_string(0xDEADBEEF) == "DEADBEEF"
    assert hex_string_to_uint("11") == 17
    assert hex_string_to_uint("deadBEEF") == 0xDEADBEEF
    assert hex_string_to_uint("") == 0


def test_get_bitlen_reference_convention():
    assert get_bitlen(0) == 1  # util.h:32-38: "0 is 1 bit"
    assert get_bitlen(1) == 1
    assert get_bitlen(2) == 2
    assert get_bitlen(0xFFFF) == 16


def test_csvwriter_quoting(tmp_path):
    csv = CSVWriter(",")
    csv.new_row().add_all("a", 'he said "hi"', "x,y", 3)
    csv.new_row().add_all(1, 2, 3, 4)
    f = tmp_path / "t.csv"
    csv.write_to_file(str(f))
    lines = f.read_text().strip().split("\n")
    assert lines[0] == 'a,"he said ""hi""","x,y",3'
    assert lines[1] == "1,2,3,4"
    # append mode
    CSVWriter(",").new_row().add_all(9).write_to_file(str(f), append=True)
    assert f.read_text().strip().split("\n")[-1] == "9"


def test_print_parameters_banner():
    from pplp_tpu.bfv import BFVContext, EncryptionParameters
    from pplp_tpu.ops.primes import get_primes

    ctx = BFVContext.build(
        EncryptionParameters.bfv(256, 1 << 16, coeff_modulus=get_primes(28, 2, 256))
    )
    buf = io.StringIO()
    print_parameters(ctx, out=lambda *a, **k: buf.write(" ".join(map(str, a)) + "\n"))
    text = buf.getvalue()
    assert "scheme: BFV" in text
    assert "poly_modulus_degree: 256" in text
    assert "56 (28 + 28) bits" in text


def test_gnrmc_parsing():
    # 4807.038 N, 01131.000 E -> 48.1173, 11.5167 deg.
    s = "$GNRMC,123519,A,4807.038,N,01131.000,E,022.4,084.4,230394,003.1,W*6A"
    lat, lng = parse_gnrmc(s)
    assert abs(lat - 48.1173) < 1e-4
    assert abs(lng - 11.516666) < 1e-4
    assert parse_gnrmc("$GNRMC,123519,V,,,,,,,230394,,*00") is None  # no fix
    assert parse_gnrmc("$GNGGA,whatever") is None
    args = coords_to_args(lat, lng)
    assert args[0] == "-x" and args[2] == "-y"
    assert args[1] == str(int(lng * 100000))


def test_print_vector_smoke():
    out = []
    print_vector(list(range(20)), out=out.append)
    assert out[0] == "    [ 0, 1, 2, 3, ..., 16, 17, 18, 19 ]"
