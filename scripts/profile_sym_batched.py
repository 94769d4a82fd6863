import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from linear_operator_tpu.operators.kernel import rbf_pallas_matvec, rbf_covar
from linear_operator_tpu.ops.rbf import kernel_matvec, sym_matvec_supported

key = jax.random.PRNGKey(0)
B, n, d, t = 4, 8192, 3, 11
x = jax.random.normal(key, (B, n, d), jnp.float32)
v = jax.random.normal(jax.random.PRNGKey(1), (B, n, t), jnp.float32)
params = {'lengthscale': jnp.asarray(1.2), 'outputscale': jnp.asarray(0.8)}

f_sym = jax.jit(lambda x, v: rbf_pallas_matvec(x, x, v, params, symmetric=True))
out = f_sym(x, v)
# correctness vs blocked dense reference (f32 HIGH)
Kd = rbf_covar(x, x, **params)
ref = jnp.einsum('bij,bjt->bit', Kd, v, precision=jax.lax.Precision.HIGHEST)
err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
print("batched sym rel err:", err)

f_rect = jax.jit(lambda x, v: rbf_pallas_matvec(x, x, v, params, symmetric=False))
float(jnp.sum(f_rect(x, v)))
float(jnp.sum(f_sym(x, v)))
for name, f in [("sym", f_sym), ("rect", f_rect)]:
    t0 = time.perf_counter()
    for _ in range(10):
        float(jnp.sum(f(x, v)))
    print(name, f"{(time.perf_counter()-t0)/10*1e3:.1f} ms")
