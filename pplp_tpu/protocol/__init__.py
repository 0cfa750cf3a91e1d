"""The pplp proximity protocol: roles, local demo, wire messages.

Reifies as a real API the ~30-line protocol sequence the reference copy-pastes
into demo/client/server/test binaries (SURVEY.md §1 L4).
"""

from .config import ProtocolConfig
from .roles import ProximityClient, ProximityServer
from .demo import run_local_demo

__all__ = ["ProtocolConfig", "ProximityClient", "ProximityServer", "run_local_demo"]
