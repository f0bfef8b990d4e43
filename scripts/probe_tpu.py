"""Tiny TPU tunnel liveness probe: exits 0 iff a cached matmul completes
within --timeout seconds (the tunnel occasionally wedges; poll this
before long TPU work, and do CPU-side work while it is down)."""
import sys, time, threading, os
ok = []
def run():
    import jax, jax.numpy as jnp
    y = jnp.ones((1024, 1024)) @ jnp.ones((1024, 1024))
    ok.append(float(y[0, 0]))
t = threading.Thread(target=run, daemon=True)
t0 = time.time()
t.start()
t.join(timeout=float(sys.argv[1]) if len(sys.argv) > 1 else 90)
if ok:
    print(f"tpu alive ({time.time()-t0:.1f}s)")
    sys.exit(0)
print(f"tpu WEDGED (no response in {time.time()-t0:.0f}s)")
os._exit(1)
