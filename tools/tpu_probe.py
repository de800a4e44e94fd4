"""3-line TPU tunnel health probe: run BEFORE any long TPU job.

Exit 0 = healthy (small matmul round-trips within the timeout);
exit 1 = tunnel degraded/down — do CPU work and retry later.
Usage: timeout 120 python tools/tpu_probe.py [seconds_budget]
"""
import sys
import time

t0 = time.time()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

budget = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
x = jnp.ones((512, 512))
v = float((x @ x).sum())
dt = time.time() - t0
ok = dt < budget
print(f"TPU probe: {jax.devices()[0].platform} matmul={v:.0f} in {dt:.1f}s "
      f"-> {'HEALTHY' if ok else 'DEGRADED'}")
sys.exit(0 if ok else 1)
