"""Multi-process (multi-host analog) validation: a REAL 2-process JAX
cluster on CPU (``jax.distributed`` coordinator + Gloo collectives over the
process boundary — the DCN analog), computing the sharded GP MLL loss and
gradients with exact parity to the single-process run.

This is the strongest multi-host check available without TPU pod hardware
(SURVEY.md section 5 "Distributed communication backend"); the virtual-mesh
tests in test_models_parallel.py cover single-process GSPMD layouts, this
covers the cross-process runtime (cluster formation, global device view,
cross-process psum inside CG).
"""

import os
import socket
import subprocess
import sys

from linear_operator_tpu.test.base_test_case import BaseTestCase

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multiprocess_worker.py")


class TestTwoProcessCluster(BaseTestCase):
    def test_two_process_sharded_mll_parity(self):
        s = socket.socket()
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
        s.close()

        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        procs = [
            subprocess.Popen(
                [sys.executable, _WORKER, str(i), "2", str(port)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
            )
            for i in range(2)
        ]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=240)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            self.assertEqual(
                p.returncode, 0, f"worker {i} failed:\n{out[-3000:]}"
            )
            self.assertIn("MULTIPROCESS_PARITY_OK", out, f"worker {i}:\n{out[-3000:]}")
