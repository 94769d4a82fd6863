import sys, json
sys.path.insert(0, "/root/repo")
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
from linear_operator_tpu.parallel import scaling_report

rep = scaling_report(device_counts=[1, 2, 4, 8], n=16384, num_probes=10,
                     block_rows=4096, reps=2)
print(json.dumps({str(k): {kk: (vv if not isinstance(vv, float) else round(vv, 4))
                           for kk, vv in v.items()} for k, v in rep.items()}, indent=1))
