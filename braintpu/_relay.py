"""Axon TPU relay probing (stdlib-only — safe to import pre-jax).

In this dev environment the device sits behind a loopback relay
(/root/.tpu_init.py); when it is down, *importing jax hangs* in any
process that still carries ``PALLAS_AXON_POOL_IPS``.  Everything that
might touch the device therefore probes these ports first.  Kept free of
any jax / package-``__init__`` dependency so bench.py and tools can
import it before deciding whether to import jax at all.
"""

from __future__ import annotations

import os
import socket

__all__ = ["RELAY_PORTS", "relay_configured", "relay_up"]

#: one port per relay group (full set is 8082–8117; one listener per
#: group suffices as a liveness signal)
RELAY_PORTS = (8082, 8092, 8102, 8112)


def relay_configured() -> bool:
    """Is this process routed through the axon relay at all?"""
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS"))


def relay_up(timeout_s: float = 3.0) -> bool:
    """True if any relay port accepts a TCP connection."""
    for port in RELAY_PORTS:
        s = socket.socket()
        s.settimeout(timeout_s)
        try:
            s.connect(("127.0.0.1", port))
            return True
        except OSError:
            continue
        finally:
            s.close()
    return False
