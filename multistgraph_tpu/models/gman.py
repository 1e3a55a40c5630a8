"""GMAN — Graph Multi-Attention Network (clean-room).

In the reference's comparison set (task_config.json:121 allows GMAN;
Implementation details.pdf p.2) with no shipped code; implemented per
Zheng et al., AAAI 2020 ("GMAN: A Graph Multi-Attention Network for
Traffic Prediction") on the framework's model API:
(B, Tin, N, F) -> (B, Tout, N, output_dim).

Structure: encoder of L ST-attention blocks -> transform attention
(bridging input horizons to output horizons) -> decoder of L blocks ->
output head. Every block runs spatial attention (over nodes) and temporal
attention (over steps), both conditioned on a spatio-temporal embedding
(STE), and merges them with a learned gate.

Deviations (documented for the parity reviewer):
  * The paper's node2vec spatial embedding is replaced by Laplacian
    eigenvector positional embeddings (host-side eigh of the normalized
    Laplacian) — same role (structure-aware node identity), no random-walk
    corpus/word2vec dependency.
  * The paper's calendar one-hots (day-of-week x time-of-day) become
    sin/cos of the time-in-day channel when the dataset provides it
    (add_time_in_day), extrapolated into the future with the configured
    time_intervals; otherwise a learned per-position embedding. The
    executor feeds only X, so future calendar inputs must be derived, not
    looked up.

TPU design notes: all attention is dense batched einsum at (N<=403,
T<=24); shapes are static, heads fold into one reshape, and the transform
attention is a (Tout, Tin) matmul per node — tiny MXU work, no scan.
"""

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.models.initializers import dense_kernel_init, torch_style_init


def laplacian_positional_embedding(adj: np.ndarray, dim: int) -> np.ndarray:
    """First `dim` non-trivial eigenvectors of the sym-normalized Laplacian."""
    from multistgraph_tpu.graph.laplacian import normalized_laplacian

    n = len(adj)
    lap = normalized_laplacian(np.maximum(adj, adj.T))
    _, vecs = np.linalg.eigh((lap + lap.T) / 2.0)
    emb = vecs[:, 1: dim + 1]
    if emb.shape[1] < dim:  # graph smaller than requested dim: pad
        emb = np.pad(emb, [(0, 0), (0, dim - emb.shape[1])])
    return emb.astype(np.float32)


class GMAN(nn.Module):
    """Graph multi-attention encoder/decoder."""

    spatial_emb: Any  # (N, se_dim) host-built positional embedding
    output_window: int
    output_dim: int
    input_dim: int = 1
    num_heads: int = 4
    head_dim: int = 8
    num_blocks: int = 1
    time_index: Optional[int] = None  # channel of time-in-day in x, if any
    time_delta: float = 1.0 / 24.0    # fraction of a day per step

    @property
    def start_dim(self) -> int:
        return 0

    @property
    def end_dim(self) -> int:
        return self.output_dim

    @property
    def model_dim(self) -> int:
        return self.num_heads * self.head_dim

    def _fc2(self, name, x, dim_out):
        c = x.shape[-1]
        w1 = self.param(name + "_w1", lambda k, s=(c, dim_out):
                        dense_kernel_init(k, s))
        b1 = self.param(name + "_b1", lambda k, s=(dim_out,): jnp.zeros(s))
        w2 = self.param(name + "_w2", lambda k, s=(dim_out, dim_out):
                        dense_kernel_init(k, s))
        b2 = self.param(name + "_b2", lambda k, s=(dim_out,): jnp.zeros(s))
        return jax.nn.relu(x @ w1 + b1) @ w2 + b2

    def _ste(self, x, t_in):
        """Spatio-temporal embedding for Tin+Tout steps: (B, Tin+Tout, N, D)."""
        d = self.model_dim
        b = x.shape[0]
        n = x.shape[2]
        t_all = t_in + self.output_window
        se = self._fc2("se", jnp.asarray(self.spatial_emb, x.dtype), d)  # (N, D)
        if self.time_index is not None and self.time_index < x.shape[-1]:
            tod = x[:, :, 0, self.time_index]  # (B, Tin), fraction of day
            future = tod[:, -1:] + self.time_delta * jnp.arange(
                1, self.output_window + 1, dtype=x.dtype)[None]
            tod_all = jnp.concatenate([tod, jnp.mod(future, 1.0)], axis=1)
            feats = jnp.stack([jnp.sin(2 * jnp.pi * tod_all),
                               jnp.cos(2 * jnp.pi * tod_all)], axis=-1)
            te = self._fc2("te", feats, d)  # (B, Tin+Tout, D)
            te = te[:, :, None, :]
        else:
            te = self.param("te_pos", lambda k, s=(1, t_all, 1, d):
                            torch_style_init(k, s))
            te = jnp.broadcast_to(te, (b, t_all, 1, d))
        return se[None, None] + te  # (B, Tin+Tout, N, D)

    def _attention(self, name, q_in, k_in, v_in, over):
        """Multi-head attention over nodes ('n') or steps ('t')."""
        d, nh, dh = self.model_dim, self.num_heads, self.head_dim
        wq = self.param(name + "_q", lambda k, s=(q_in.shape[-1], d):
                        dense_kernel_init(k, s))
        wk_ = self.param(name + "_k", lambda k, s=(k_in.shape[-1], d):
                         dense_kernel_init(k, s))
        wv = self.param(name + "_v", lambda k, s=(v_in.shape[-1], d):
                        dense_kernel_init(k, s))
        b, tq, n, _ = q_in.shape
        tk = k_in.shape[1]
        q = (q_in @ wq).reshape(b, tq, n, nh, dh)
        k = (k_in @ wk_).reshape(b, tk, n, nh, dh)
        v = (v_in @ wv).reshape(b, tk, n, nh, dh)
        if over == "n":
            att = jax.nn.softmax(
                jnp.einsum("btnhd,btmhd->bthnm", q, k) / jnp.sqrt(float(dh)), -1)
            out = jnp.einsum("bthnm,btmhd->btnhd", att, v)
        else:
            att = jax.nn.softmax(
                jnp.einsum("btnhd,bsnhd->bnhts", q, k) / jnp.sqrt(float(dh)), -1)
            out = jnp.einsum("bnhts,bsnhd->btnhd", att, v)
        wo = self.param(name + "_o", lambda k, s=(d, d): dense_kernel_init(k, s))
        return out.reshape(b, tq, n, d) @ wo

    def _st_block(self, name, h, ste):
        """Spatial + temporal attention with gated fusion (paper eq. 8-10)."""
        d = self.model_dim
        hs = jnp.concatenate([h, ste], axis=-1)
        h_spatial = self._attention(name + "_sp", hs, hs, h, "n")
        h_temporal = self._attention(name + "_tm", hs, hs, h, "t")
        wz1 = self.param(name + "_z1", lambda k, s=(d, d): dense_kernel_init(k, s))
        wz2 = self.param(name + "_z2", lambda k, s=(d, d): dense_kernel_init(k, s))
        zb = self.param(name + "_zb", lambda k, s=(d,): jnp.zeros(s))
        z = jax.nn.sigmoid(h_spatial @ wz1 + h_temporal @ wz2 + zb)
        fused = z * h_spatial + (1.0 - z) * h_temporal
        return h + self._fc2(name + "_out", fused, d)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, n, _f = x.shape
        d = self.model_dim
        ste = self._ste(x, t)
        ste_past, ste_future = ste[:, :t], ste[:, t:]

        h = self._fc2("lift", x[..., : self.input_dim], d)
        for i in range(self.num_blocks):
            h = self._st_block("enc{}".format(i), h, ste_past)

        # transform attention: queries from future STE, keys from past STE
        h = self._attention("trans", ste_future, ste_past, h, "t")

        for i in range(self.num_blocks):
            h = self._st_block("dec{}".format(i), h, ste_future)

        w1 = self.param("head_w1", lambda k, s=(d, d): dense_kernel_init(k, s))
        b1 = self.param("head_b1", lambda k, s=(d,): jnp.zeros(s))
        w2 = self.param("head_w2", lambda k, s=(d, self.output_dim):
                        dense_kernel_init(k, s))
        b2 = self.param("head_b2", lambda k, s=(self.output_dim,): jnp.zeros(s))
        return jax.nn.relu(h @ w1 + b1) @ w2 + b2  # (B, Tout, N, output_dim)


def build_gman(config, data_feature) -> GMAN:
    adj = np.asarray(data_feature.get("adj_mx"))
    se_dim = min(config.get("se_dim", 16), max(len(adj) - 1, 1))
    output_dim = data_feature.get("output_dim", 1)
    # time-in-day sits right after the target channels when enabled
    time_index = output_dim if config.get("add_time_in_day", False) else None
    seconds = config.get("time_intervals", 3600)
    if config.get("gman_se", "laplacian") == "node2vec":
        # the paper's actual spatial-embedding method (graph/node2vec.py);
        # Laplacian eigenvectors stay the cheap deterministic default
        from multistgraph_tpu.graph.node2vec import node2vec_embedding

        spatial_emb = node2vec_embedding(
            adj, se_dim,
            num_walks=config.get("n2v_walks", 10),
            walk_length=config.get("n2v_length", 80),
            window=config.get("n2v_window", 10),
            p=config.get("n2v_p", 1.0), q=config.get("n2v_q", 1.0),
            seed=config.get("seed", 0) or 0,
        )
    else:
        spatial_emb = laplacian_positional_embedding(adj, se_dim)
    return GMAN(
        spatial_emb=spatial_emb,
        output_window=config.get("output_window", 1),
        output_dim=output_dim,
        input_dim=data_feature.get("feature_dim", 1),
        num_heads=config.get("num_heads", 4),
        head_dim=config.get("head_dim", 8),
        num_blocks=config.get("num_blocks", 1),
        time_index=time_index,
        time_delta=seconds / 86400.0,
    )
