"""Convolutional spatio-temporal baselines: STGCN and GWNET (Graph WaveNet).

Both are in the reference's comparison set (task_config.json:96-99 allows
them; Implementation details.pdf p.1-2 reports them) but the trimmed repo
ships no code — these are clean-room TPU-native implementations on the
framework's model API (input (B, Tin, N, F) -> (B, Tout, N, output_dim)),
registered with TrafficStatePointDataset (plain sliding windows,
use_3tu=False).

TPU design notes: neither model has recurrence — every op is a matmul over
a (B*T*N, C) flattening, so the whole forward is a chain of large MXU
matmuls with no scan. Temporal (dilated/causal) convolutions are expressed
as shifted-slice matmul sums rather than lax.conv: for the tiny kernel
sizes here (Kt=2..3) that keeps everything in plain dot_general form that
XLA tiles perfectly, and avoids NCHW layout shuffles.

* **STGCN** (Yu et al., IJCAI 2018 — "Spatio-Temporal Graph Convolutional
  Networks"): two ST-Conv blocks, each = gated temporal conv (GLU) ->
  Chebyshev spatial graph conv (scaled-Laplacian supports) -> gated
  temporal conv -> LayerNorm; then an output temporal conv collapsing the
  remaining window and a two-layer head to all horizons at once.
* **GWNET** (Wu et al., IJCAI 2019 — "Graph WaveNet"): stacked dilated
  causal temporal convolutions with tanh*sigmoid gating, per-layer skip
  connections, and a diffusion graph convolution over forward/backward
  random-walk transition matrices plus an adaptive adjacency
  softmax(relu(E1 E2^T)); skip sum -> relu -> 1x1 convs -> all horizons.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.models.initializers import dense_kernel_init, torch_style_init


class _ConvBaselineMixin:
    @property
    def start_dim(self) -> int:
        return 0

    @property
    def end_dim(self) -> int:
        return self.output_dim


def _linear(module, name, dim_in, dim_out, bias=True):
    wk = module.param("{}_kernel".format(name),
                      lambda k, s=(dim_in, dim_out): dense_kernel_init(k, s))
    if not bias:
        return wk, None
    wb = module.param("{}_bias".format(name), lambda k, s=(dim_out,): jnp.zeros(s))
    return wk, wb


def _temporal_slices(x, kt, dilation=1):
    """List of kt time-shifted views of x:(B,T,N,C), each (B, T', N, C).

    Element j is x[:, j*d : T-(kt-1-j)*d], so summing slice_j @ W_j gives a
    causal temporal convolution with kernel kt and the given dilation whose
    output index t corresponds to input window [t, t + (kt-1)*d].
    """
    t = x.shape[1]
    span = (kt - 1) * dilation
    return [x[:, j * dilation: t - (span - j * dilation)] for j in range(kt)]


class STGCN(nn.Module, _ConvBaselineMixin):
    """Spatio-Temporal Graph Convolutional Network (Chebyshev variant)."""

    supports: Any  # (Ks, N, N) Chebyshev polynomials of the scaled Laplacian
    output_window: int
    output_dim: int
    input_dim: int = 1
    kt: int = 3
    channels: Sequence[Sequence[int]] = ((64, 16, 64), (64, 16, 64))
    dropout: float = 0.0

    def _temporal_glu(self, name, x, dim_in, dim_out):
        """Gated temporal conv: (P + res) * sigmoid(Q), trims kt-1 steps."""
        slices = _temporal_slices(x, self.kt)
        wk = self.param("{}_kernel".format(name),
                        lambda k, s=(self.kt, dim_in, 2 * dim_out): torch_style_init(k, s))
        wb = self.param("{}_bias".format(name), lambda k, s=(2 * dim_out,): jnp.zeros(s))
        y = sum(s @ wk[j] for j, s in enumerate(slices)) + wb
        p, q = jnp.split(y, 2, axis=-1)
        if dim_in == dim_out:
            res = x[:, self.kt - 1:]
        elif dim_in > dim_out:
            res = x[:, self.kt - 1:, :, :dim_out]
        else:
            pad = [(0, 0)] * 3 + [(0, dim_out - dim_in)]
            res = jnp.pad(x[:, self.kt - 1:], pad)
        return (p + res) * jax.nn.sigmoid(q)

    def _cheb_gconv(self, name, x, dim_in, dim_out):
        """Chebyshev graph conv + ReLU residual: (B,T,N,dim_out)."""
        sup = jnp.asarray(self.supports, x.dtype)  # (K, N, N)
        xg = jnp.einsum("knm,btmc->btknc", sup, x)
        b, t, k, n, c = xg.shape
        wk = self.param("{}_kernel".format(name),
                        lambda kk, s=(k * c, dim_out): dense_kernel_init(kk, s))
        wb = self.param("{}_bias".format(name), lambda kk, s=(dim_out,): jnp.zeros(s))
        y = xg.transpose(0, 1, 3, 2, 4).reshape(b, t, n, k * c) @ wk + wb
        if dim_in == dim_out:
            y = y + x
        return jax.nn.relu(y)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, n, f = x.shape
        h = x[..., : self.input_dim]
        dim_in = self.input_dim
        for i, (c_t1, c_s, c_t2) in enumerate(self.channels):
            h = self._temporal_glu("b{}_t1".format(i), h, dim_in, c_t1)
            h = self._cheb_gconv("b{}_s".format(i), h, c_t1, c_s)
            h = self._temporal_glu("b{}_t2".format(i), h, c_s, c_t2)
            h = nn.LayerNorm(name="b{}_ln".format(i))(h)
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
            dim_in = c_t2

        t_rem = h.shape[1]
        if t_rem < 1:
            raise ValueError(
                "input window too short for {} ST-Conv blocks of kt={}".format(
                    len(self.channels), self.kt))
        # output block: GLU over the full remaining window (collapses time)
        wk = self.param("out_t_kernel",
                        lambda k, s=(t_rem, dim_in, 2 * dim_in): torch_style_init(k, s))
        wb = self.param("out_t_bias", lambda k, s=(2 * dim_in,): jnp.zeros(s))
        y = jnp.einsum("btnc,tcd->bnd", h, wk) + wb
        p, q = jnp.split(y, 2, axis=-1)
        y = nn.LayerNorm(name="out_ln")((p + h[:, -1]) * jax.nn.sigmoid(q))
        wk1, wb1 = _linear(self, "head1", dim_in, dim_in)
        y = jax.nn.relu(y @ wk1 + wb1)
        wk2, wb2 = _linear(self, "head2", dim_in, self.output_window * self.output_dim)
        out = y @ wk2 + wb2  # (B, N, Tout*D)
        return out.reshape(b, n, self.output_window, self.output_dim).transpose(0, 2, 1, 3)


class GWNET(nn.Module, _ConvBaselineMixin):
    """Graph WaveNet: dilated gated TCN + diffusion/adaptive graph conv."""

    supports: Any  # (S, N, N) random-walk transition matrices (possibly S=0)
    num_nodes: int
    output_window: int
    output_dim: int
    input_dim: int = 1
    residual_channels: int = 32
    dilation_channels: int = 32
    skip_channels: int = 256
    end_channels: int = 512
    blocks: int = 4
    layers: int = 2
    kernel_size: int = 2
    diffusion_order: int = 2
    adaptive: bool = True
    embed_dim: int = 10
    dropout: float = 0.3

    def _gconv(self, name, x, supports, dim_in, dim_out):
        """Diffusion conv: concat powers of each support applied to x."""
        outs = [x]
        for s in supports:
            xk = x
            for _ in range(self.diffusion_order):
                xk = jnp.einsum("nm,btmc->btnc", s, xk)
                outs.append(xk)
        z = jnp.concatenate(outs, axis=-1)
        wk, wb = _linear(self, name, z.shape[-1], dim_out)
        return z @ wk + wb

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, n, f = x.shape
        h = x[..., : self.input_dim]

        receptive = 1 + (self.kernel_size - 1) * self.blocks * (2 ** self.layers - 1)
        if t < receptive:
            h = jnp.pad(h, [(0, 0), (receptive - t, 0), (0, 0), (0, 0)])

        supports = [jnp.asarray(s, h.dtype) for s in self.supports]
        if self.adaptive:
            e1 = self.param("adp_e1",
                            lambda k, s=(n, self.embed_dim): torch_style_init(k, s))
            e2 = self.param("adp_e2",
                            lambda k, s=(self.embed_dim, n): torch_style_init(k, s))
            supports = supports + [jax.nn.softmax(jax.nn.relu(e1 @ e2), axis=1)]

        wk, wb = _linear(self, "start", self.input_dim, self.residual_channels)
        h = h @ wk + wb

        skip_total = 0.0
        for bi in range(self.blocks):
            dilation = 1
            for li in range(self.layers):
                name = "b{}l{}".format(bi, li)
                slices = _temporal_slices(h, self.kernel_size, dilation)
                fw = self.param(name + "_filter",
                                lambda k, s=(self.kernel_size, self.residual_channels,
                                             self.dilation_channels): torch_style_init(k, s))
                gw = self.param(name + "_gate",
                                lambda k, s=(self.kernel_size, self.residual_channels,
                                             self.dilation_channels): torch_style_init(k, s))
                filt = jnp.tanh(sum(s @ fw[j] for j, s in enumerate(slices)))
                gate = jax.nn.sigmoid(sum(s @ gw[j] for j, s in enumerate(slices)))
                z = filt * gate  # (B, T', N, dilation_channels)

                sk, sb = _linear(self, name + "_skip", self.dilation_channels,
                                 self.skip_channels)
                skip_total = z[:, -1] @ sk + sb + skip_total  # last step only

                g = self._gconv(name + "_gconv", z, supports,
                                self.dilation_channels, self.residual_channels)
                if self.dropout > 0:
                    g = nn.Dropout(self.dropout, deterministic=not train)(g)
                h = g + h[:, -g.shape[1]:]  # residual, trimmed to causal length
                dilation *= 2

        y = jax.nn.relu(skip_total)  # (B, N, skip_channels)
        wk1, wb1 = _linear(self, "end1", self.skip_channels, self.end_channels)
        y = jax.nn.relu(y @ wk1 + wb1)
        wk2, wb2 = _linear(self, "end2", self.end_channels,
                           self.output_window * self.output_dim)
        out = y @ wk2 + wb2
        return out.reshape(b, n, self.output_window, self.output_dim).transpose(0, 2, 1, 3)


def _cheb_supports(adj: np.ndarray, k: int) -> np.ndarray:
    """[T_0..T_{k-1}] of the scaled Laplacian 2L/lmax - I (STGCN supports)."""
    from multistgraph_tpu.graph.laplacian import cheb_polynomials, scaled_laplacian

    sl = scaled_laplacian(adj, lambda_max=None, undirected=True)
    return np.stack(cheb_polynomials(sl, max(k, 1)))


def _random_walk_supports(adj: np.ndarray) -> list:
    """[D^-1 A, D'^-1 A^T] forward/backward transition matrices (GWNET)."""
    from multistgraph_tpu.graph.laplacian import random_walk_matrix

    adj = np.asarray(adj, np.float64)
    return [random_walk_matrix(adj), random_walk_matrix(adj.T)]


def build_stgcn(config, data_feature) -> STGCN:
    adj = np.asarray(data_feature.get("adj_mx"))
    return STGCN(
        supports=_cheb_supports(adj, config.get("Ks", 3)),
        output_window=config.get("output_window", 1),
        output_dim=data_feature.get("output_dim", 1),
        input_dim=data_feature.get("output_dim", 1),
        kt=config.get("Kt", 3),
        dropout=config.get("dropout", 0.0),
    )


def build_gwnet(config, data_feature) -> GWNET:
    adj = np.asarray(data_feature.get("adj_mx"))
    return GWNET(
        supports=_random_walk_supports(adj),
        num_nodes=data_feature.get("num_nodes", 1),
        output_window=config.get("output_window", 1),
        output_dim=data_feature.get("output_dim", 1),
        input_dim=data_feature.get("output_dim", 1),
        residual_channels=config.get("residual_channels", 32),
        dilation_channels=config.get("dilation_channels", 32),
        skip_channels=config.get("skip_channels", 256),
        end_channels=config.get("end_channels", 512),
        blocks=config.get("blocks", 4),
        layers=config.get("layers", 2),
        diffusion_order=config.get("diffusion_order", 2),
        adaptive=config.get("adpadj", "adaptive") != "none",
        embed_dim=config.get("embed_dim_adj", 10),
        dropout=config.get("dropout", 0.3),
    )
