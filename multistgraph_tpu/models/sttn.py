"""STTN — Spatial-Temporal Transformer Networks (clean-room).

In the reference's comparison set (task_config.json:133 allows STTN; the
reference keeps a frozen torch copy in libcity/temp/STTN.py as dev history,
which was not consulted); implemented per Xu et al., 2020
("Spatial-Temporal Transformer Networks for Traffic Flow Forecasting") on
the framework's model API: (B, Tin, N, F) -> (B, Tout, N, output_dim).

Each block = spatial transformer + temporal transformer:
  * Spatial transformer: per-timestep multi-head self-attention over nodes,
    gate-fused with a fixed 2-hop graph-conv branch over the normalized
    adjacency (the paper's fixed + dynamic dual branch), residual + LN +
    position-wise FFN.
  * Temporal transformer: per-node multi-head self-attention over time with
    a learned temporal position embedding, residual + LN + FFN.
Head: dense collapse of (T, C) per node to all horizons at once.

TPU design notes: attention is batched einsums over (B,T,H,N,N) /
(B,N,H,T,T) score tensors — at N<=403 and T<=24 these are small, dense, and
MXU-tileable; no masking, no dynamic shapes.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.models.initializers import dense_kernel_init, torch_style_init


class STTN(nn.Module):
    """Stacked spatial + temporal transformer blocks."""

    adj_norm: Any  # (N, N) symmetric-normalized adjacency
    output_window: int
    output_dim: int
    input_dim: int = 1
    hidden_dim: int = 64
    num_heads: int = 4
    num_blocks: int = 2
    ffn_dim: int = 128
    dropout: float = 0.0

    @property
    def start_dim(self) -> int:
        return 0

    @property
    def end_dim(self) -> int:
        return self.output_dim

    def _mha(self, name, x, axis_label):
        """Multi-head self-attention over nodes ('n') or time ('t')."""
        c = x.shape[-1]
        nh = self.num_heads
        dh = c // nh
        qkv = []
        for part in ("q", "k", "v"):
            wk = self.param("{}_{}_kernel".format(name, part),
                            lambda k, s=(c, c): dense_kernel_init(k, s))
            qkv.append(x @ wk)
        q, k, v = qkv
        b, t, n, _ = x.shape
        q = q.reshape(b, t, n, nh, dh)
        k = k.reshape(b, t, n, nh, dh)
        v = v.reshape(b, t, n, nh, dh)
        if axis_label == "n":
            scores = jnp.einsum("btnhd,btmhd->bthnm", q, k) / jnp.sqrt(float(dh))
            att = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bthnm,btmhd->btnhd", att, v)
        else:
            scores = jnp.einsum("btnhd,bsnhd->bnhts", q, k) / jnp.sqrt(float(dh))
            att = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bnhts,bsnhd->btnhd", att, v)
        out = out.reshape(b, t, n, c)
        wo = self.param("{}_o_kernel".format(name),
                        lambda k, s=(c, c): dense_kernel_init(k, s))
        return out @ wo

    def _ffn(self, name, x):
        c = x.shape[-1]
        w1 = self.param(name + "_w1", lambda k, s=(c, self.ffn_dim):
                        dense_kernel_init(k, s))
        b1 = self.param(name + "_b1", lambda k, s=(self.ffn_dim,): jnp.zeros(s))
        w2 = self.param(name + "_w2", lambda k, s=(self.ffn_dim, c):
                        dense_kernel_init(k, s))
        b2 = self.param(name + "_b2", lambda k, s=(c,): jnp.zeros(s))
        return jax.nn.relu(x @ w1 + b1) @ w2 + b2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, n, _f = x.shape
        c = self.hidden_dim
        a = jnp.asarray(self.adj_norm, x.dtype)

        wk = self.param("lift_kernel",
                        lambda k, s=(self.input_dim, c): dense_kernel_init(k, s))
        wb = self.param("lift_bias", lambda k, s=(c,): jnp.zeros(s))
        h = x[..., : self.input_dim] @ wk + wb

        for blk in range(self.num_blocks):
            name = "b{}".format(blk)
            # --- spatial transformer: attention branch + fixed-graph branch
            att = self._mha(name + "_sat", h, "n")
            g1 = self.param(name + "_gc1", lambda k, s=(c, c): dense_kernel_init(k, s))
            g2 = self.param(name + "_gc2", lambda k, s=(c, c): dense_kernel_init(k, s))
            gcn = jnp.einsum("nm,btmc->btnc", a, jax.nn.relu(
                jnp.einsum("nm,btmc->btnc", a, h) @ g1)) @ g2
            gw = self.param(name + "_gate_kernel",
                            lambda k, s=(2 * c, c): dense_kernel_init(k, s))
            gb = self.param(name + "_gate_bias", lambda k, s=(c,): jnp.zeros(s))
            gate = jax.nn.sigmoid(jnp.concatenate([att, gcn], axis=-1) @ gw + gb)
            s_out = gate * att + (1.0 - gate) * gcn
            h = nn.LayerNorm(name=name + "_sln1")(h + s_out)
            h = nn.LayerNorm(name=name + "_sln2")(h + self._ffn(name + "_sffn", h))

            # --- temporal transformer with learned position embedding
            pe = self.param(name + "_pos_emb",
                            lambda k, s=(1, t, 1, c): torch_style_init(k, s))
            t_out = self._mha(name + "_tat", h + pe, "t")
            h = nn.LayerNorm(name=name + "_tln1")(h + t_out)
            h = nn.LayerNorm(name=name + "_tln2")(h + self._ffn(name + "_tffn", h))
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)

        wk = self.param("head_kernel",
                        lambda k, s=(t, c, self.output_window * self.output_dim):
                        torch_style_init(k, s))
        wb = self.param("head_bias",
                        lambda k, s=(self.output_window * self.output_dim,):
                        jnp.zeros(s))
        out = jnp.einsum("btnc,tcd->bnd", h, wk) + wb
        return out.reshape(b, n, self.output_window, self.output_dim).transpose(0, 2, 1, 3)


def build_sttn(config, data_feature) -> STTN:
    from multistgraph_tpu.models.graph_baselines import _sym_norm_adj

    adj = np.asarray(data_feature.get("adj_mx"))
    return STTN(
        adj_norm=_sym_norm_adj(adj),
        output_window=config.get("output_window", 1),
        output_dim=data_feature.get("output_dim", 1),
        input_dim=data_feature.get("feature_dim", 1),
        hidden_dim=config.get("rnn_units", 64),
        num_heads=config.get("num_heads", 4),
        num_blocks=config.get("num_blocks", 2),
        ffn_dim=config.get("ffn_dim", 128),
        dropout=config.get("dropout", 0.0),
    )
