"""ASTGCN — Attention-based Spatial-Temporal GCN (clean-room).

In the reference's comparison set (task_config.json:102 allows ASTGCN and
MSTGCN; Implementation details.pdf p.1) with no shipped code; implemented
per Guo et al., AAAI 2019 ("Attention Based Spatial-Temporal Graph
Convolutional Networks for Traffic Flow Forecasting") on the framework's
model API: (B, Tin, N, F) -> (B, Tout, N, output_dim).

This is the single-component variant (the "Common"/recent-only form): the
paper's separate recent/daily/weekly branches are this framework's MTH
windowing (use_3tu) applied at the data layer, so the model itself takes
one fused window. Each ST block:

  temporal attention (T x T, softmax) reweights the time axis ->
  spatial attention (N x N, softmax) modulates every Chebyshev support ->
  Chebyshev graph conv + ReLU ->
  temporal conv (kernel 3, same padding) ->
  1x1 residual + LayerNorm.

MSTGCN (same paper's attention-free ablation, also in the comparison set)
is the `use_attention=False` configuration of this module.

TPU design notes: attention scores are built with einsums over the raw
(B,T,N,C) layout — no NCHW permutes; the temporal conv is a 3-tap
shifted-slice matmul sum (see conv_baselines.py) and every projection is a
flattened (B*T*N, C) matmul for the MXU.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.models.initializers import dense_kernel_init, torch_style_init


class ASTGCN(nn.Module):
    """Attention-based spatial-temporal GCN (recent-component form)."""

    supports: Any  # (K, N, N) Chebyshev polynomials of the scaled Laplacian
    output_window: int
    output_dim: int
    input_dim: int = 1
    nb_block: int = 2
    nb_filter: int = 64
    temporal_kernel: int = 3
    use_attention: bool = True  # False = MSTGCN

    @property
    def start_dim(self) -> int:
        return 0

    @property
    def end_dim(self) -> int:
        return self.output_dim

    def _temporal_attention(self, name, x):
        """E (B, T, T) softmax over the last axis (paper eq. 6-7)."""
        b, t, n, c = x.shape
        u1 = self.param(name + "_u1", lambda k, s=(n,): torch_style_init(k, s))
        u2 = self.param(name + "_u2", lambda k, s=(c, n): torch_style_init(k, s))
        u3 = self.param(name + "_u3", lambda k, s=(c,): torch_style_init(k, s))
        be = self.param(name + "_be", lambda k, s=(t, t): torch_style_init(k, s))
        ve = self.param(name + "_ve", lambda k, s=(t, t): torch_style_init(k, s))
        lhs = jnp.einsum("btnc,n,cm->btm", x, u1, u2)   # (B, T, N)
        rhs = jnp.einsum("c,bsnc->bns", u3, x)          # (B, N, T)
        scores = ve @ jax.nn.sigmoid(lhs @ rhs + be)    # (B, T, T)
        return jax.nn.softmax(scores, axis=-1)

    def _spatial_attention(self, name, x):
        """S (B, N, N) softmax over the last axis (paper eq. 4-5)."""
        b, t, n, c = x.shape
        w1 = self.param(name + "_w1", lambda k, s=(t,): torch_style_init(k, s))
        w2 = self.param(name + "_w2", lambda k, s=(c, t): torch_style_init(k, s))
        w3 = self.param(name + "_w3", lambda k, s=(c,): torch_style_init(k, s))
        bs = self.param(name + "_bs", lambda k, s=(n, n): torch_style_init(k, s))
        vs = self.param(name + "_vs", lambda k, s=(n, n): torch_style_init(k, s))
        lhs = jnp.einsum("btnc,t,cs->bns", x, w1, w2)   # (B, N, T)
        rhs = jnp.einsum("c,btmc->btm", w3, x)          # (B, T, N)
        scores = vs @ jax.nn.sigmoid(lhs @ rhs + bs)    # (B, N, N)
        return jax.nn.softmax(scores, axis=-1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, n, _f = x.shape
        h = x[..., : self.input_dim]
        sup = jnp.asarray(self.supports, x.dtype)  # (K, N, N)
        k_order = sup.shape[0]

        for blk in range(self.nb_block):
            name = "b{}".format(blk)
            c_in = h.shape[-1]

            if self.use_attention:
                e = self._temporal_attention(name + "_tat", h)
                h_t = jnp.einsum("bts,bsnc->btnc", e, h)
                s = self._spatial_attention(name + "_sat", h_t)
                # attention-modulated supports: T_k elementwise* S per batch
                xg = jnp.einsum("knm,bnm,btmc->btknc", sup, s, h_t)
            else:
                xg = jnp.einsum("knm,btmc->btknc", sup, h)

            wk = self.param(
                name + "_cheb_kernel",
                lambda k, s=(k_order * c_in, self.nb_filter): dense_kernel_init(k, s))
            wb = self.param(name + "_cheb_bias",
                            lambda k, s=(self.nb_filter,): jnp.zeros(s))
            g = xg.transpose(0, 1, 3, 2, 4).reshape(b, t, n, k_order * c_in) @ wk + wb
            g = jax.nn.relu(g)

            # temporal conv, kernel 3, same padding (paper's time_strides=1)
            pad = self.temporal_kernel // 2
            gp = jnp.pad(g, [(0, 0), (pad, self.temporal_kernel - 1 - pad),
                             (0, 0), (0, 0)])
            tk = self.param(
                name + "_tconv_kernel",
                lambda k, s=(self.temporal_kernel, self.nb_filter, self.nb_filter):
                    torch_style_init(k, s))
            tb = self.param(name + "_tconv_bias",
                            lambda k, s=(self.nb_filter,): jnp.zeros(s))
            tc = sum(gp[:, j: j + t] @ tk[j] for j in range(self.temporal_kernel)) + tb

            rk = self.param(name + "_res_kernel",
                            lambda k, s=(c_in, self.nb_filter): dense_kernel_init(k, s))
            h = nn.LayerNorm(name=name + "_ln")(jax.nn.relu(h @ rk + tc))

        # output head: collapse (T, nb_filter) per node to all horizons
        wk = self.param(
            "head_kernel",
            lambda k, s=(t, self.nb_filter, self.output_window * self.output_dim):
                torch_style_init(k, s))
        wb = self.param(
            "head_bias",
            lambda k, s=(self.output_window * self.output_dim,): jnp.zeros(s))
        out = jnp.einsum("btnc,tcd->bnd", h, wk) + wb
        return out.reshape(b, n, self.output_window, self.output_dim).transpose(0, 2, 1, 3)


def _build_astgcn_like(use_attention):
    def builder(config, data_feature):
        from multistgraph_tpu.graph.laplacian import cheb_polynomials, scaled_laplacian

        adj = np.asarray(data_feature.get("adj_mx"))
        sl = scaled_laplacian(adj, lambda_max=None, undirected=True)
        sups = np.stack(cheb_polynomials(sl, max(config.get("cheb_order", 3), 1)))
        return ASTGCN(
            supports=sups,
            output_window=config.get("output_window", 1),
            output_dim=data_feature.get("output_dim", 1),
            input_dim=data_feature.get("feature_dim", 1),
            nb_block=config.get("nb_block", 2),
            nb_filter=config.get("nb_filter", 64),
            use_attention=use_attention,
        )

    return builder


build_astgcn = _build_astgcn_like(True)
build_mstgcn = _build_astgcn_like(False)
