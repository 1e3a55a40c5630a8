"""STSGCN — Spatial-Temporal Synchronous GCN (clean-room).

In the reference's comparison set (task_config.json:125 allows STSGCN; the
reference keeps a frozen torch copy in libcity/temp/STSGCN.py as dev
history, which was not consulted); implemented per Song et al., AAAI 2020
("Spatial-Temporal Synchronous Graph Convolutional Networks") on the
framework's model API: (B, Tin, N, F) -> (B, Tout, N, output_dim).

Core idea: a localized spatial-temporal graph over 3 consecutive steps —
a (3N, 3N) block matrix with the spatial adjacency on the diagonal blocks
and identity connections between the same node at adjacent steps. An
STSGCM applies a stack of GLU graph convolutions on that graph and crops
the middle N rows, aggregating layers with an elementwise max; an STSGCL
slides the 3-step window over time (shrinking T by 2) after adding
learnable spatial and temporal position embeddings. The head predicts each
horizon step with its own dense over the remaining (T', C) window.

Both of the paper's module modes are supported: "individual" (the paper's
default — each window position has its own STSGCM parameters) and "sharing"
(one STSGCM per layer, the paper's ablation). Deviation (documented for the
parity reviewer): the input-feature lift is a dense layer.

TPU design notes: the T-2 window positions are folded into the batch
dimension, so each GLU graph conv is ONE (3N, 3N) x (3N, B*(T-2)*C) matmul
chain — no per-window Python loop reaches XLA. "individual" keeps the same
batching: the per-position kernels are one stacked (T', C, 2H) tensor
applied with a single position-batched einsum.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.models.initializers import dense_kernel_init, torch_style_init


def build_sync_adjacency(adj: np.ndarray, steps: int = 3) -> np.ndarray:
    """(steps*N, steps*N) localized ST graph: A on the diagonal blocks,
    I between the same node at adjacent steps (paper fig. 2)."""
    n = len(adj)
    big = np.zeros((steps * n, steps * n), np.float32)
    eye = np.eye(n, dtype=np.float32)
    a = np.asarray(adj, np.float32) + eye  # self-loops on spatial blocks
    for s in range(steps):
        big[s * n:(s + 1) * n, s * n:(s + 1) * n] = a
        if s + 1 < steps:
            big[s * n:(s + 1) * n, (s + 1) * n:(s + 2) * n] = eye
            big[(s + 1) * n:(s + 2) * n, s * n:(s + 1) * n] = eye
    # row-normalize so repeated propagation stays bounded
    deg = big.sum(axis=1, keepdims=True)
    return big / np.where(deg > 0, deg, 1.0)


class STSGCN(nn.Module):
    """Stacked spatial-temporal synchronous graph conv layers."""

    sync_adj: Any  # (3N, 3N) from build_sync_adjacency
    num_nodes: int
    output_window: int
    output_dim: int
    input_dim: int = 1
    hidden_dim: int = 64
    gcn_depth: int = 3
    num_layers: int = 2
    window: int = 3
    module_type: str = "individual"  # paper default; "sharing" = ablation

    @property
    def start_dim(self) -> int:
        return 0

    @property
    def end_dim(self) -> int:
        return self.output_dim

    def _stsgcm(self, name, xw, t_out):
        """GLU graph-conv stack on (B*T', 3N, C); max over cropped layers.

        "sharing": one kernel for every window position. "individual": a
        stacked (T', C, 2H) kernel, applied with one position-batched einsum
        — same MXU batching, per-position parameters."""
        a = jnp.asarray(self.sync_adj, xw.dtype)
        n, w = self.num_nodes, self.window
        mid = (w // 2) * n
        individual = self.module_type == "individual"
        h = xw
        crops = []
        for d in range(self.gcn_depth):
            c_in = h.shape[-1]
            if individual:
                wk = self.param("{}_g{}_kernel".format(name, d),
                                lambda k, s=(t_out, c_in, 2 * self.hidden_dim):
                                dense_kernel_init(k, s))
                wb = self.param("{}_g{}_bias".format(name, d),
                                lambda k, s=(t_out, 1, 2 * self.hidden_dim):
                                jnp.zeros(s))
                hg = jnp.einsum("pq,btqc->btpc",
                                a, h.reshape(-1, t_out, w * n, c_in))
                z = jnp.einsum("btpc,tcd->btpd", hg, wk) + wb
                z = z.reshape(-1, w * n, 2 * self.hidden_dim)
            else:
                wk = self.param("{}_g{}_kernel".format(name, d),
                                lambda k, s=(c_in, 2 * self.hidden_dim):
                                dense_kernel_init(k, s))
                wb = self.param("{}_g{}_bias".format(name, d),
                                lambda k, s=(2 * self.hidden_dim,): jnp.zeros(s))
                z = jnp.einsum("pq,bqc->bpc", a, h) @ wk + wb
            p, q = jnp.split(z, 2, axis=-1)
            h = p * jax.nn.sigmoid(q)  # GLU
            crops.append(h[:, mid: mid + n])
        return jnp.max(jnp.stack(crops), axis=0)  # (B*T', N, hidden)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, n, _f = x.shape
        w = self.window
        h = x[..., : self.input_dim]

        wk = self.param("lift_kernel",
                        lambda k, s=(self.input_dim, self.hidden_dim):
                        dense_kernel_init(k, s))
        wb = self.param("lift_bias", lambda k, s=(self.hidden_dim,): jnp.zeros(s))
        h = h @ wk + wb  # (B, T, N, H)

        for li in range(self.num_layers):
            t_cur = h.shape[1]
            t_out = t_cur - (w - 1)
            if t_out < 1:
                raise ValueError(
                    "input window too short for {} STSGCN layers".format(
                        self.num_layers))
            se = self.param("l{}_spatial_emb".format(li),
                            lambda k, s=(1, 1, n, h.shape[-1]): torch_style_init(k, s))
            te = self.param("l{}_temporal_emb".format(li),
                            lambda k, s=(1, t_cur, 1, h.shape[-1]):
                            torch_style_init(k, s))
            hp = h + se + te
            # windows -> batch: (B, t_out, w, N, C) -> (B*t_out, w*N, C)
            wins = jnp.stack([hp[:, j: j + t_out] for j in range(w)], axis=2)
            xw = wins.reshape(b * t_out, w * n, h.shape[-1])
            out = self._stsgcm("l{}".format(li), xw, t_out)  # (B*t_out, N, H)
            h = out.reshape(b, t_out, n, self.hidden_dim)

        # per-horizon heads over the remaining (T', H) window
        t_rem = h.shape[1]
        flat = jnp.transpose(h, (0, 2, 1, 3)).reshape(b, n, t_rem * self.hidden_dim)
        w1 = self.param("head1_kernel",
                        lambda k, s=(t_rem * self.hidden_dim,
                                     self.output_window * self.hidden_dim):
                        dense_kernel_init(k, s))
        b1 = self.param("head1_bias",
                        lambda k, s=(self.output_window * self.hidden_dim,):
                        jnp.zeros(s))
        y = jax.nn.relu(flat @ w1 + b1).reshape(b, n, self.output_window,
                                                self.hidden_dim)
        w2 = self.param("head2_kernel",
                        lambda k, s=(self.output_window, self.hidden_dim,
                                     self.output_dim): torch_style_init(k, s))
        b2 = self.param("head2_bias",
                        lambda k, s=(self.output_window, self.output_dim):
                        jnp.zeros(s))
        out = jnp.einsum("bnoc,ocd->bnod", y, w2) + b2[None, None]
        return out.transpose(0, 2, 1, 3)  # (B, Tout, N, D)


def build_stsgcn(config, data_feature) -> STSGCN:
    adj = np.asarray(data_feature.get("adj_mx"))
    return STSGCN(
        sync_adj=build_sync_adjacency(adj, config.get("stsg_window", 3)),
        num_nodes=data_feature.get("num_nodes", 1),
        output_window=config.get("output_window", 1),
        output_dim=data_feature.get("output_dim", 1),
        input_dim=data_feature.get("feature_dim", 1),
        hidden_dim=config.get("rnn_units", 64),
        gcn_depth=config.get("gcn_depth", 3),
        num_layers=config.get("num_layers", 2),
        window=config.get("stsg_window", 3),
        module_type=config.get("module_type", "individual"),
    )
