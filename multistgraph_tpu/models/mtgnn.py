"""MTGNN — Multivariate Time-series GNN with graph learning (clean-room).

In the reference's comparison set (task_config.json:104 allows MTGNN;
Implementation details.pdf p.2) with no shipped code; implemented per
Wu et al., KDD 2020 ("Connecting the Dots: Multivariate Time Series
Forecasting with Graph Neural Networks") on the framework's model API:
(B, Tin, N, F) -> (B, Tout, N, output_dim).

Pieces:
  * Graph learning layer: node embeddings E1, E2 -> M_i = tanh(alpha E_i W_i),
    A = relu(tanh(alpha (M1 M2^T - M2 M1^T))) sparsified to the top-k
    neighbours per row (uni-directional by construction).
  * Per layer: dilated-inception temporal conv (kernels 2/3/6/7 split across
    channels) with tanh x sigmoid gating, a skip connection collapsing the
    remaining window, and a mix-hop propagation graph conv
    (h_i = beta x + (1-beta) A_hat h_{i-1}, hops concatenated then mixed)
    run over A and A^T and summed; residual + LayerNorm.
  * Head: relu(skip sum) -> two dense layers -> all horizons at once.

TPU design notes: everything stays in (B, T, N, C); dilated convs are
shifted-slice matmul sums; the top-k sparsification uses lax.top_k with a
static k so the learned adjacency stays a dense (N, N) matmul operand (at
N <= 403 dense SpMM is the right call on the MXU — see docs/DESIGN.md §4).
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from multistgraph_tpu.models.initializers import dense_kernel_init, torch_style_init


def learned_adjacency(e1, e2, w1, w2, alpha, k):
    """A = relu(tanh(alpha (M1 M2^T - M2 M1^T))) kept to top-k per row."""
    m1 = jnp.tanh(alpha * (e1 @ w1))
    m2 = jnp.tanh(alpha * (e2 @ w2))
    a = jax.nn.relu(jnp.tanh(alpha * (m1 @ m2.T - m2 @ m1.T)))
    kth = jax.lax.top_k(a, k)[0][:, -1:]  # per-row k-th largest value
    return jnp.where(a >= kth, a, 0.0)


class MTGNN(nn.Module):
    """Graph-learning + dilated-inception TCN forecaster."""

    num_nodes: int
    output_window: int
    output_dim: int
    input_dim: int = 1
    embed_dim: int = 40
    subgraph_size: int = 20
    conv_channels: int = 32
    residual_channels: int = 32
    skip_channels: int = 64
    end_channels: int = 128
    layers: int = 3
    kernel_set: Sequence[int] = (2, 3, 6, 7)
    dilation_exponential: int = 1
    gdep: int = 2
    alpha: float = 3.0
    propalpha: float = 0.05
    dropout: float = 0.3
    use_gcn: bool = True

    @property
    def start_dim(self) -> int:
        return 0

    @property
    def end_dim(self) -> int:
        return self.output_dim

    def _graph_learn(self):
        n, d = self.num_nodes, self.embed_dim
        e1 = self.param("gl_e1", lambda k, s=(n, d): torch_style_init(k, s))
        e2 = self.param("gl_e2", lambda k, s=(n, d): torch_style_init(k, s))
        w1 = self.param("gl_w1", lambda k, s=(d, d): dense_kernel_init(k, s))
        w2 = self.param("gl_w2", lambda k, s=(d, d): dense_kernel_init(k, s))
        return learned_adjacency(e1, e2, w1, w2, self.alpha,
                                 min(self.subgraph_size, n))

    def _mixhop(self, name, x, adj, c_in, c_out):
        """h_i = beta x + (1-beta) A_hat h_{i-1}; concat hops -> 1x1 mix."""
        n = adj.shape[0]
        a = adj + jnp.eye(n, dtype=adj.dtype)
        a = a / a.sum(axis=1, keepdims=True)
        hops = [x]
        h = x
        for _ in range(self.gdep):
            h = self.propalpha * x + (1.0 - self.propalpha) * jnp.einsum(
                "nm,btmc->btnc", a, h)
            hops.append(h)
        z = jnp.concatenate(hops, axis=-1)
        wk = self.param(name + "_kernel",
                        lambda k, s=((self.gdep + 1) * c_in, c_out):
                        dense_kernel_init(k, s))
        wb = self.param(name + "_bias", lambda k, s=(c_out,): jnp.zeros(s))
        return z @ wk + wb

    def _inception(self, name, x, c_in, c_out, dilation):
        """Dilated inception conv: kernels split c_out evenly, causal."""
        n_k = len(self.kernel_set)
        c_each = c_out // n_k
        max_span = (max(self.kernel_set) - 1) * dilation
        outs = []
        for ki, kt in enumerate(self.kernel_set):
            wk = self.param(
                "{}_k{}".format(name, kt),
                lambda k, s=(kt, c_in, c_each): torch_style_init(k, s))
            span = (kt - 1) * dilation
            t = x.shape[1]
            y = sum(x[:, j * dilation: t - (span - j * dilation)] @ wk[j]
                    for j in range(kt))
            # align all branches to the shortest (largest-kernel) output
            outs.append(y[:, max_span - span:])
        return jnp.concatenate(outs, axis=-1)

    def _time_collapse(self, name, x, c_out):
        """Dense over the remaining window: (B,T',N,C) -> (B,N,c_out)."""
        t, c = x.shape[1], x.shape[-1]
        wk = self.param(name + "_kernel",
                        lambda k, s=(t, c, c_out): torch_style_init(k, s))
        wb = self.param(name + "_bias", lambda k, s=(c_out,): jnp.zeros(s))
        return jnp.einsum("btnc,tcd->bnd", x, wk) + wb

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, n, _f = x.shape
        h = x[..., : self.input_dim]

        q = self.dilation_exponential
        spans = [(max(self.kernel_set) - 1) * q ** i for i in range(self.layers)]
        receptive = 1 + sum(spans)
        if t < receptive:
            h = jnp.pad(h, [(0, 0), (receptive - t, 0), (0, 0), (0, 0)])

        adj = self._graph_learn() if self.use_gcn else None

        wk, wb = (
            self.param("start_kernel",
                       lambda k, s=(self.input_dim, self.residual_channels):
                       dense_kernel_init(k, s)),
            self.param("start_bias",
                       lambda k, s=(self.residual_channels,): jnp.zeros(s)),
        )
        h = h @ wk + wb

        skip = self._time_collapse("skip0", h, self.skip_channels)
        dilation = 1
        for li in range(self.layers):
            name = "l{}".format(li)
            residual = h
            filt = jnp.tanh(self._inception(name + "_f", h, self.residual_channels,
                                            self.conv_channels, dilation))
            gate = jax.nn.sigmoid(self._inception(name + "_g", h,
                                                  self.residual_channels,
                                                  self.conv_channels, dilation))
            z = filt * gate
            if self.dropout > 0:
                z = nn.Dropout(self.dropout, deterministic=not train)(z)
            skip = skip + self._time_collapse(name + "_skip", z, self.skip_channels)
            if self.use_gcn:
                g = (self._mixhop(name + "_mh1", z, adj,
                                  self.conv_channels, self.residual_channels)
                     + self._mixhop(name + "_mh2", z, adj.T,
                                    self.conv_channels, self.residual_channels))
            else:
                gk = self.param(name + "_nogcn_kernel",
                                lambda k, s=(self.conv_channels,
                                             self.residual_channels):
                                dense_kernel_init(k, s))
                g = z @ gk
            h = nn.LayerNorm(name=name + "_ln")(g + residual[:, -g.shape[1]:])
            dilation *= q

        skip = skip + self._time_collapse("skipE", h, self.skip_channels)
        y = jax.nn.relu(skip)
        w1, b1 = (
            self.param("end1_kernel",
                       lambda k, s=(self.skip_channels, self.end_channels):
                       dense_kernel_init(k, s)),
            self.param("end1_bias", lambda k, s=(self.end_channels,): jnp.zeros(s)),
        )
        w2, b2 = (
            self.param("end2_kernel",
                       lambda k, s=(self.end_channels,
                                    self.output_window * self.output_dim):
                       dense_kernel_init(k, s)),
            self.param("end2_bias",
                       lambda k, s=(self.output_window * self.output_dim,):
                       jnp.zeros(s)),
        )
        out = jax.nn.relu(y @ w1 + b1) @ w2 + b2
        return out.reshape(b, n, self.output_window, self.output_dim).transpose(0, 2, 1, 3)


def build_mtgnn(config, data_feature) -> MTGNN:
    num_nodes = data_feature.get("num_nodes", 1)
    return MTGNN(
        num_nodes=num_nodes,
        output_window=config.get("output_window", 1),
        output_dim=data_feature.get("output_dim", 1),
        input_dim=data_feature.get("feature_dim", 1),
        embed_dim=min(config.get("embed_dim_node", 40), num_nodes),
        subgraph_size=min(config.get("subgraph_size", 20), num_nodes),
        conv_channels=config.get("conv_channels", 32),
        residual_channels=config.get("residual_channels", 32),
        skip_channels=config.get("skip_channels", 64),
        end_channels=config.get("end_channels", 128),
        layers=config.get("layers", 3),
        dilation_exponential=config.get("dilation_exponential", 1),
        gdep=config.get("gcn_depth", 2),
        alpha=config.get("tanhalpha", 3.0),
        propalpha=config.get("propalpha", 0.05),
        dropout=config.get("dropout", 0.3),
        use_gcn=not config.get("gcn_off", False),
    )
