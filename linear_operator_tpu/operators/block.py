"""Block operators: block-diagonal and interleaved layouts over a batched base.

Reference: linear_operator/operators/block_linear_operator.py:15-176,
block_diag_linear_operator.py:37-230, block_interleaved_linear_operator.py:15-153.

The base operator carries a block batch dimension at -3; everything delegates
to the base's batched ops (structure-preserving — a BlockDiag of Toeplitz
blocks runs batched FFTs): matmul/solve/cholesky reshape the rhs between
(kn, t) and (k, n, t), logdets and inv-quads sum over the block dim.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import operator_class
from ._linear_operator import LinearOperator


class BlockLinearOperator(LinearOperator):
    """Abstract base for block layouts (reference
    block_linear_operator.py:15-176).

    Subclasses carry the blocks as the -3 batch dimension of ``base`` and
    decide the layout (diagonal, interleaved, summed — see
    :class:`BlockDiagLinearOperator`, :class:`BlockInterleavedLinearOperator`,
    and ``sum_batch.SumBatchLinearOperator``).  The reference's ``block_dim``
    permutation happens at construction time here (permute batch dims first);
    this class exists for ``isinstance`` checks and porting parity.
    """


@operator_class
class BlockDiagLinearOperator(BlockLinearOperator):
    base: LinearOperator  # (*b, k, n, m)

    def __new__(cls, base=None):
        # Constructor shortcut (reference block_diag_linear_operator.py:20-35,
        # _MetaBlockDiagLinearOperator): a block-diagonal of diagonal blocks
        # IS a diagonal operator — return one directly so downstream dispatch
        # gets the O(N) closed forms.  Pytree unflatten and ``_pytree.replace``
        # use ``object.__new__`` and never hit this path.
        from .diag import DiagLinearOperator

        if cls is BlockDiagLinearOperator and isinstance(base, DiagLinearOperator):
            diag = base._diagonal()  # (*b, k, n)
            return DiagLinearOperator(diag.reshape(*diag.shape[:-2], -1))
        return object.__new__(cls)

    @property
    def _symmetric_hint(self) -> bool:
        return self.base._symmetric_hint

    @property
    def num_blocks(self) -> int:
        return self.base.shape[-3]

    def _shape(self) -> tuple[int, ...]:
        s = self.base.shape
        return (*s[:-3], s[-3] * s[-2], s[-3] * s[-1])

    def _split_rhs(self, rhs: jax.Array) -> jax.Array:
        k = self.num_blocks
        m = self.base.shape[-1]
        t = rhs.shape[-1]
        return rhs.reshape(*rhs.shape[:-2], k, m, t)

    def _join_out(self, out: jax.Array) -> jax.Array:
        k, n = out.shape[-3], out.shape[-2]
        return out.reshape(*out.shape[:-3], k * n, out.shape[-1])

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        return self._join_out(self.base._matmul(self._split_rhs(rhs)))

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        k = self.num_blocks
        n = self.base.shape[-2]
        x = rhs.reshape(*rhs.shape[:-2], k, n, rhs.shape[-1])
        return self._join_out(self.base._t_matmul(x))

    def _transpose(self) -> "BlockDiagLinearOperator":
        return BlockDiagLinearOperator(self.base._transpose())

    def _diagonal(self) -> jax.Array:
        d = self.base._diagonal()  # (*b, k, n)
        return d.reshape(*d.shape[:-2], -1)

    def to_dense(self) -> jax.Array:
        dense = self.base.to_dense()  # (*b, k, n, m)
        k, n, m = dense.shape[-3:]
        eye = jnp.eye(k, dtype=dense.dtype)
        out = dense[..., :, None, :, :] * eye[:, :, None, None]
        out = jnp.moveaxis(out, -3, -2)  # (*b, k, n, k, m)
        return out.reshape(*dense.shape[:-3], k * n, k * m)

    # -- delegation (reference :80-230) ------------------------------------

    def _solve_structure(self, rhs: jax.Array):
        from ..functions import solve

        return self._join_out(solve(self.base, self._split_rhs(rhs)))

    def _logdet_structure(self):
        from ..functions import inv_quad_logdet

        _, ld = inv_quad_logdet(self.base, None, logdet=True)
        return jnp.sum(ld, axis=-1)

    def _inv_quad_logdet_structure(self, rhs, logdet):
        from ..functions import inv_quad_logdet

        split = None if rhs is None else self._split_rhs(rhs)
        iq, ld = inv_quad_logdet(
            self.base, split, logdet=logdet, reduce_inv_quad=False
        )
        if rhs is None:
            iq_out = jnp.zeros(self.batch_shape, dtype=self.dtype)
        else:
            iq_out = jnp.sum(iq, axis=-2)  # sum over blocks, keep columns
        ld_out = jnp.sum(ld, axis=-1) if logdet else jnp.zeros(
            self.batch_shape, dtype=self.dtype
        )
        return iq_out, ld_out

    def _cholesky_impl(self, upper: bool = False):
        from .triangular import TriangularLinearOperator

        inner = self.base._cholesky_impl(upper=upper)
        base_tri = inner._tensor if isinstance(inner, TriangularLinearOperator) else inner
        return TriangularLinearOperator(
            BlockDiagLinearOperator(base_tri), upper=upper
        )

    def _root_structure(self):
        r = self.base._root_structure()
        if r is None:
            from ..functions import root_decomposition

            r = root_decomposition(self.base).root
        return BlockDiagLinearOperator(r)

    def _root_inv_structure(self):
        r = self.base._root_inv_structure()
        if r is None:
            from ..functions import root_inv_decomposition

            r = root_inv_decomposition(self.base).root
        return BlockDiagLinearOperator(r)

    def eigvalsh(self) -> jax.Array:
        ev = self.base.eigvalsh()  # (*b, k, n)
        return jnp.sort(ev.reshape(*ev.shape[:-2], -1), axis=-1)

    def _expand_batch(self, batch_shape):
        return BlockDiagLinearOperator(
            self.base._expand_batch((*batch_shape, self.num_blocks))
        )

    def _get_indices(self, row_index, col_index, *batch_indices):
        n = self.base.shape[-2]
        m = self.base.shape[-1]
        rb, ri = row_index // n, row_index % n
        cb, ci = col_index // m, col_index % m
        vals = self.base._get_indices(ri, ci, *batch_indices, rb)
        return jnp.where(rb == cb, vals, jnp.zeros_like(vals))


@operator_class
class BlockInterleavedLinearOperator(BlockDiagLinearOperator):
    """Same blocks but interleaved indices (multitask layout; reference
    block_interleaved_linear_operator.py:15-153): entry (i*k + s, j*k + s)
    comes from block s."""

    def _split_rhs(self, rhs: jax.Array) -> jax.Array:
        k = self.num_blocks
        m = self.base.shape[-1]
        x = rhs.reshape(*rhs.shape[:-2], m, k, rhs.shape[-1])
        return jnp.swapaxes(x, -3, -2)  # (*b, k, m, t)

    def _join_out(self, out: jax.Array) -> jax.Array:
        x = jnp.swapaxes(out, -3, -2)  # (*b, n, k, t)
        return x.reshape(*x.shape[:-3], -1, x.shape[-1])

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        return self._join_out(self.base._t_matmul(self._split_rhs(rhs)))

    def _transpose(self):
        return BlockInterleavedLinearOperator(self.base._transpose())

    def _diagonal(self) -> jax.Array:
        d = self.base._diagonal()  # (*b, k, n)
        return jnp.swapaxes(d, -1, -2).reshape(*d.shape[:-2], -1)

    def to_dense(self) -> jax.Array:
        dense = self.base.to_dense()  # (*b, k, n, m)
        k, n, m = dense.shape[-3:]
        eye = jnp.eye(k, dtype=dense.dtype)
        # entry (i*k + s, j*k + s') = base[s][i, j] * delta(s, s')
        out = jnp.einsum("...knm,ks->...nkms", dense, eye)
        return out.reshape(*dense.shape[:-3], n * k, m * k)

    def _cholesky_impl(self, upper: bool = False):
        from .triangular import TriangularLinearOperator

        inner = self.base._cholesky_impl(upper=upper)
        base_tri = inner._tensor if isinstance(inner, TriangularLinearOperator) else inner
        return TriangularLinearOperator(
            BlockInterleavedLinearOperator(base_tri), upper=upper
        )

    def _root_structure(self):
        r = super()._root_structure()
        return BlockInterleavedLinearOperator(r.base)

    def _root_inv_structure(self):
        r = super()._root_inv_structure()
        return BlockInterleavedLinearOperator(r.base)

    def _expand_batch(self, batch_shape):
        return BlockInterleavedLinearOperator(
            self.base._expand_batch((*batch_shape, self.num_blocks))
        )

    def _get_indices(self, row_index, col_index, *batch_indices):
        k = self.num_blocks
        rb, ri = row_index % k, row_index // k
        cb, ci = col_index % k, col_index // k
        vals = self.base._get_indices(ri, ci, *batch_indices, rb)
        return jnp.where(rb == cb, vals, jnp.zeros_like(vals))