"""Multi-process (multi-host analog) validation: REAL multi-process JAX
clusters on CPU (``jax.distributed`` coordinator + Gloo collectives over the
process boundary — the DCN analog), computing the sharded GP MLL loss and
gradients with exact parity to the single-process run.

This is the strongest multi-host check available without TPU pod hardware
(SURVEY.md section 5 "Distributed communication backend"); the virtual-mesh
tests in test_models_parallel.py cover single-process GSPMD layouts, this
covers the cross-process runtime (cluster formation, global device view,
cross-process psum inside CG) — at 2 processes on a (data, model) mesh and
at 4 processes on the full 3-axis (data, model, probe) mesh.
"""

import os
import socket
import subprocess
import sys

from linear_operator_tpu.test.base_test_case import BaseTestCase

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multiprocess_worker.py")


def _run_cluster(nproc: int, mode: str = "2axis", timeout: int = 300):
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), str(nproc), str(port), mode],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    return procs, outs


class TestMultiProcessCluster(BaseTestCase):
    def _check(self, procs, outs):
        for i, (p, out) in enumerate(zip(procs, outs)):
            self.assertEqual(
                p.returncode, 0, f"worker {i} failed:\n{out[-3000:]}"
            )
            self.assertIn("MULTIPROCESS_PARITY_OK", out, f"worker {i}:\n{out[-3000:]}")

    def test_two_process_sharded_mll_parity(self):
        self._check(*_run_cluster(2, "2axis", timeout=240))

    def test_four_process_three_axis_parity(self):
        """4 processes x 4 local devices = a 16-device (4, 2, 2) mesh with
        data, model AND probe axes all crossing process boundaries."""
        self._check(*_run_cluster(4, "3axis", timeout=360))
