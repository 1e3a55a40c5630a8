"""Graph-convolutional baseline models: AGCRN and TGCN.

Both appear in the reference's comparison set (task_config.json:95-164 allows
them; Implementation details.pdf p.1-2 reports them), but the trimmed repo
ships no code for them — these are clean-room TPU-native implementations on
the framework's model API (input (B, Tin, N, F) -> (B, Tout, N, output_dim),
recurrence as `lax.scan`), registered with TrafficStatePointDataset
(plain sliding windows, use_3tu=False).

* **AGCRN** (Bai et al., NeurIPS 2020 — "Adaptive Graph Convolutional
  Recurrent Network"): MultiATGCN's direct ancestor. Purely-adaptive graph
  `softmax(relu(E E^T))` over learned node embeddings, Chebyshev support
  stack [I, A, 2A·T_{k-1} - T_{k-2}, ...], node-conditioned weight pools
  `W[n] = E[n] @ pool`, GRU whose gate/candidate transforms are that graph
  conv, last-hidden 1x1 projection to all horizons at once.
* **TGCN** (Zhao et al., T-ITS 2019): symmetric-normalized predefined graph
  `D^-1/2 (A+I) D^-1/2`, a 2-hop graph convolution shared across nodes
  feeding GRU gates, last-hidden projection.

Like the framework's MultiATGCN, supports are built once per forward (static
per graph) and the time loop is one `lax.scan` per model.
"""

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.models.initializers import dense_kernel_init, torch_style_init


class _GraphBaselineMixin:
    @property
    def start_dim(self) -> int:
        return 0

    @property
    def end_dim(self) -> int:
        return self.output_dim


class AGCRN(nn.Module, _GraphBaselineMixin):
    """Adaptive Graph Convolutional Recurrent Network."""

    num_nodes: int
    output_window: int
    output_dim: int
    hidden_dim: int = 64
    embed_dim: int = 10
    cheb_k: int = 2
    num_layers: int = 2

    def _gconv_params(self, name, dim_in, dim_out):
        pool = self.param(
            "{}_pool".format(name),
            lambda k, s=(self.embed_dim, self.cheb_k, dim_in, dim_out):
                torch_style_init(k, s))
        bias = self.param(
            "{}_bias_pool".format(name),
            lambda k, s=(self.embed_dim, dim_out): torch_style_init(k, s))
        return pool, bias

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, n, _f = x.shape
        if n != self.num_nodes:
            raise ValueError("graph built for {} nodes, input has {}".format(
                self.num_nodes, n))
        h = self.hidden_dim
        emb = self.param(
            "node_emb", lambda k, s=(n, self.embed_dim): torch_style_init(k, s))

        # adaptive supports, built once per forward: [I, A, cheb...]
        adapt = jax.nn.softmax(jax.nn.relu(emb @ emb.T), axis=1)
        sups = [jnp.eye(n, dtype=x.dtype), adapt]
        for _ in range(2, self.cheb_k):
            sups.append(2.0 * adapt @ sups[-1] - sups[-2])
        supports = jnp.stack(sups[: max(self.cheb_k, 1)])  # (K, N, N)

        def gconv(state, inp, pool, bias):
            """Node-conditioned graph conv on [inp, state]: (B, N, dim_out)."""
            z = jnp.concatenate([inp, state], axis=-1)
            zg = jnp.einsum("knm,bmc->bknc", supports, z)
            w = jnp.einsum("nd,dkio->nkio", emb, pool)
            return jnp.einsum("bkni,nkio->bno", zg, w) + emb @ bias

        seq = jnp.transpose(x, (1, 0, 2, 3))  # (T, B, N, F)
        for layer in range(self.num_layers):
            dim_in = seq.shape[-1]
            gate_p, gate_b = self._gconv_params("l{}_gate".format(layer), dim_in + h, 2 * h)
            cand_p, cand_b = self._gconv_params("l{}_cand".format(layer), dim_in + h, h)

            def step(state, inp, gp=gate_p, gb=gate_b, cp=cand_p, cb=cand_b):
                zr = jax.nn.sigmoid(gconv(state, inp, gp, gb))
                z, r = jnp.split(zr, 2, axis=-1)
                hc = jnp.tanh(gconv(r * state, inp, cp, cb))
                new = z * state + (1.0 - z) * hc
                return new, new

            state0 = jnp.zeros((b, n, h), x.dtype)
            _, seq = jax.lax.scan(step, state0, seq)

        last = seq[-1]  # (B, N, H)
        wk = self.param(
            "head_kernel",
            lambda k, s=(h, self.output_window * self.output_dim):
                dense_kernel_init(k, s))
        wb = self.param(
            "head_bias",
            lambda k, s=(self.output_window * self.output_dim,):
                jax.random.uniform(k, s, minval=-0.05, maxval=0.05))
        out = last @ wk + wb  # (B, N, Tout*D)
        return out.reshape(b, n, self.output_window, self.output_dim).transpose(0, 2, 1, 3)


class TGCN(nn.Module, _GraphBaselineMixin):
    """Temporal Graph Convolutional Network over a predefined graph."""

    adj_norm: Any  # (N, N) symmetric-normalized adjacency (host-built)
    output_window: int
    output_dim: int
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, n, f = x.shape
        h = self.hidden_dim
        a = jnp.asarray(self.adj_norm, x.dtype)

        def make_gc(name, dim_in, dim_out):
            k1 = self.param("{}_w1".format(name),
                            lambda k, s=(dim_in, dim_out): dense_kernel_init(k, s))
            k2 = self.param("{}_w2".format(name),
                            lambda k, s=(dim_out, dim_out): dense_kernel_init(k, s))
            bias = self.param("{}_b".format(name),
                              lambda k, s=(dim_out,):
                              jax.random.uniform(k, s, minval=-0.05, maxval=0.05))

            def gc(z):
                # two-hop propagation: A (A z W1) W2, shared across nodes
                y = jnp.einsum("nm,bmc->bnc", a, z) @ k1
                return jnp.einsum("nm,bmc->bnc", a, y) @ k2 + bias
            return gc

        gc_gate = make_gc("gate", f + h, 2 * h)
        gc_cand = make_gc("cand", f + h, h)

        def step(state, inp):
            zc = jnp.concatenate([inp, state], axis=-1)
            zr = jax.nn.sigmoid(gc_gate(zc))
            z, r = jnp.split(zr, 2, axis=-1)
            hc = jnp.tanh(gc_cand(jnp.concatenate([inp, r * state], axis=-1)))
            new = z * state + (1.0 - z) * hc
            return new, new

        seq = jnp.transpose(x, (1, 0, 2, 3))
        state0 = jnp.zeros((b, n, h), x.dtype)
        last, _ = jax.lax.scan(step, state0, seq)

        wk = self.param("head_kernel",
                        lambda k, s=(h, self.output_window * self.output_dim):
                        dense_kernel_init(k, s))
        wb = self.param("head_bias",
                        lambda k, s=(self.output_window * self.output_dim,):
                        jax.random.uniform(k, s, minval=-0.05, maxval=0.05))
        out = last @ wk + wb
        return out.reshape(b, n, self.output_window, self.output_dim).transpose(0, 2, 1, 3)


def _sym_norm_adj(adj: np.ndarray) -> np.ndarray:
    """D^-1/2 (A + I) D^-1/2 with zero-degree guards."""
    a = np.asarray(adj, np.float64) + np.eye(len(adj))
    d = a.sum(axis=1)
    d_inv = 1.0 / np.sqrt(np.where(d > 0, d, 1.0))
    return (a * d_inv[:, None] * d_inv[None, :]).astype(np.float32)


def build_agcrn(config, data_feature) -> AGCRN:
    return AGCRN(
        num_nodes=data_feature.get("num_nodes", 1),
        output_window=config.get("output_window", 1),
        output_dim=data_feature.get("output_dim", 1),
        hidden_dim=config.get("rnn_units", 64),
        embed_dim=config.get("embed_dim_node", 10),
        cheb_k=config.get("cheb_order", 2),
        num_layers=config.get("num_layers", 2),
    )


def build_tgcn(config, data_feature) -> TGCN:
    adj = np.asarray(data_feature.get("adj_mx"))
    return TGCN(
        adj_norm=_sym_norm_adj(adj),
        output_window=config.get("output_window", 1),
        output_dim=data_feature.get("output_dim", 1),
        hidden_dim=config.get("rnn_units", 64),
    )
