"""Tunnel liveness probe: device enumeration + one tiny op + a host fence.

Run this FIRST after any suspected tunnel outage (symptom: a TPU script
stuck at ~0 CPU in a nanosleep retry loop right after the xla_bridge
platform warning). Exits 0 and prints PROBE OK when the chip answers;
raises the backend's real error (e.g. UNAVAILABLE) when the service is
down — each attempt can itself take ~25 min of internal retries before
the backend gives up, so run it in the background and poll the log.

Never wrap attached TPU work in `timeout`: a kill while attached wedges
the tunnel for ~30+ min (CLAUDE.md "TUNNEL HAZARD").
"""
import time

import jax
import jax.numpy as jnp

t0 = time.time()
print("devices:", jax.devices(), f"({time.time()-t0:.0f}s)", flush=True)
t0 = time.time()
print("op:", float(jnp.sum(jnp.ones((8, 8)))), f"({time.time()-t0:.0f}s)",
      flush=True)
print("PROBE OK", flush=True)
