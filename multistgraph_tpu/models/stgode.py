"""STGODE — Spatial-Temporal Graph ODE Network (clean-room).

Paper-only comparison model: the reference paper's comparison set includes
STGODE (SURVEY.md §6; Implementation details.pdf p.1-2) but the repo ships
no implementation. Implemented per Fang et al., KDD 2021 ("Spatial-Temporal
Graph ODE Networks for Traffic Flow Forecasting") on the framework model
API: (B, Tin, N, F) -> (B, Tout, N, output_dim).

Structure: two graph views — the spatial adjacency and a semantic graph
built from DTW distances between node activity profiles — each processed by
`num_blocks` PARALLEL ST blocks (gated temporal conv -> graph-ODE ->
gated temporal conv, all applied to the same lifted input). The 2 x
num_blocks block outputs aggregate with an elementwise max, then a
two-layer head maps each node's remaining (T', C) window to the horizon.

The continuous graph propagation solves the restart-augmented linear ODE
dH/dt = alpha ⊙ (Â H − H) + H0  from H(0)=H0 over t in [0, 1]. Because Â
is STATIC and symmetric, the default solver is the exact closed form in
Â's eigenbasis (computed once on the host at trace time): per channel the
solution is elementwise (e^z + phi1(z)) in eigencoordinates with
z = alpha_c (lam − 1) — two (N, N) MXU matmuls per block instead of a
time-stepping loop, and zero integration error. ``ode_solver='rk4'``
keeps the fixed-step RK4 ``lax.scan`` integrator (used automatically for
asymmetric supports, and as the oracle the spectral path is tested
against). The restart term H0 is the paper's defense against
oversmoothing: the steady state blends diffusion with the block input
instead of collapsing to the graph's dominant eigenvector.

Deviations (documented for the parity reviewer): the semantic DTW runs on
per-node mean daily profiles with a Sakoe-Chiba band (the official code
DTWs full multi-month series offline, which is O(T^2) per pair and
unusable at framework-build time; profiles keep the build at
O(N^2 · P^2), P=24, with the same "similar daily shape" semantics), and
temporal convs are shifted-slice matmul sums (MXU-friendly) rather than
im2col convolutions.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.models.conv_baselines import (
    _ConvBaselineMixin,
    _linear,
    _temporal_slices,
)
from multistgraph_tpu.models.initializers import torch_style_init


def dtw_profile_distances(profiles: np.ndarray, band: int = 4,
                          native: bool = None) -> np.ndarray:
    """All-pairs DTW distance over per-node profiles (N, P).

    Vectorized dynamic program: one (N, N) relaxation per (t, s) cell, cells
    outside the Sakoe-Chiba |t - s| <= band are forbidden. Returns (N, N)
    symmetric distances with zero diagonal.

    ``native=None`` auto-uses the threaded C++ kernel
    (multistgraph_tpu/native) when available — identical float32 DP, and it
    avoids this path's O(N^2 P^2) cost tensor (374 MB at N=403, P=24).
    """
    profiles = np.asarray(profiles, np.float32)
    if native is None:
        from multistgraph_tpu import native as _native_mod
        native = _native_mod.available()
    if native:
        from multistgraph_tpu.native import dtw_band_native
        return dtw_band_native(profiles, band)
    n, p = profiles.shape
    # pairwise local costs: (N, N, P, P)
    cost = np.abs(profiles[:, None, :, None] - profiles[None, :, None, :])
    inf = np.float32(np.inf)
    dp = np.full((n, n, p, p), inf, np.float32)
    for t in range(p):
        lo, hi = max(0, t - band), min(p, t + band + 1)
        for s in range(lo, hi):
            c = cost[:, :, t, s]
            if t == 0 and s == 0:
                dp[:, :, t, s] = c
                continue
            best = np.full((n, n), inf, np.float32)
            if t > 0:
                best = np.minimum(best, dp[:, :, t - 1, s])
            if s > 0:
                best = np.minimum(best, dp[:, :, t, s - 1])
            if t > 0 and s > 0:
                best = np.minimum(best, dp[:, :, t - 1, s - 1])
            dp[:, :, t, s] = c + best
    d = dp[:, :, p - 1, p - 1]
    d = 0.5 * (d + d.T)
    np.fill_diagonal(d, 0.0)
    return d


def semantic_adjacency_from_dtw(dist: np.ndarray, sparsity: float = 0.1) -> np.ndarray:
    """Gaussian-kernel graph from DTW distances, thresholded to the given
    edge density (paper §4.1 builds A_se by DTW similarity thresholding)."""
    d = np.asarray(dist, np.float64)
    off = d[~np.eye(len(d), dtype=bool)]
    sigma = off.std() + 1e-8
    a = np.exp(-((d / sigma) ** 2))
    np.fill_diagonal(a, 0.0)
    if off.size:
        thresh = np.quantile(a[~np.eye(len(a), dtype=bool)], 1.0 - sparsity)
        a = np.where(a >= thresh, a, 0.0)
    return a.astype(np.float32)


def _sym_norm_with_self_loops(adj: np.ndarray) -> np.ndarray:
    """D^{-1/2} (A + I) D^{-1/2} — spectral radius <= 1 keeps the linear ODE
    non-expansive, so fixed-step RK4 over [0, 1] is stable."""
    a = np.asarray(adj, np.float32) + np.eye(len(adj), dtype=np.float32)
    deg = a.sum(axis=1)
    d = 1.0 / np.sqrt(np.where(deg > 0, deg, 1.0))
    return (a * d[:, None]) * d[None, :]


class STGODE(nn.Module, _ConvBaselineMixin):
    """Parallel TCN–ODE–TCN blocks over spatial + semantic graph views."""

    supports: Any  # (2, N, N) normalized spatial + semantic adjacency
    output_window: int
    output_dim: int
    input_dim: int = 1
    hidden_dim: int = 64
    kt: int = 3
    num_blocks: int = 3
    ode_steps: int = 6
    head_dim: int = 128
    # 'spectral' (default): closed-form solution of the linear ODE in the
    # static graph's eigenbasis — 2 MXU matmuls per block instead of RK4's
    # 24 graph matvecs (~12x fewer ODE FLOPs), and exact in time.
    # 'rk4': the fixed-step integrator (fallback for asymmetric supports,
    # and the oracle the spectral path is tested against).
    ode_solver: str = "spectral"

    def _alpha(self, name, h):
        alpha_raw = self.param("{}_alpha".format(name),
                               lambda k, s=(h.shape[-1],): jnp.zeros(s))
        return jax.nn.sigmoid(alpha_raw.astype(h.dtype))

    def _ode_rk4(self, name, h, a):
        """RK4 integration of dH/dt = alpha ⊙ (Â H − H) + H0 over [0, 1]."""
        alpha = self._alpha(name, h)
        h0 = h
        dt = jnp.asarray(1.0 / self.ode_steps, h.dtype)

        def f(y):
            return alpha * (jnp.einsum("nm,btmc->btnc", a, y) - y) + h0

        def step(y, _):
            k1 = f(y)
            k2 = f(y + 0.5 * dt * k1)
            k3 = f(y + 0.5 * dt * k2)
            k4 = f(y + dt * k3)
            return y + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

        y, _ = jax.lax.scan(step, h, None, length=self.ode_steps)
        return y

    def _ode_spectral(self, name, h, u, lam):
        """Exact solution of the same linear ODE in Â's eigenbasis.

        With Â = U diag(lam) Uᵀ (static, so the eigendecomposition happens
        once on the host at trace time), the per-channel operator
        L_c = alpha_c (Â − I) diagonalizes jointly: in the eigenbasis the
        solution of dH/dt = L H + H0 at t=1 is elementwise
        (e^z + phi1(z)) ĥ with z = alpha_c (lam − 1) and
        phi1(z) = (e^z − 1)/z. Two (N, N) matmuls total, no time stepping,
        zero integration error; gradients flow to alpha through exp/phi1.
        """
        alpha = self._alpha(name, h)
        z = alpha[None, :] * (lam[:, None] - 1.0)  # (N_eig, C), z <= 0
        # phi1 via expm1 is accurate for z -> 0-; guard the removable
        # singularity at exactly 0 (lam = 1 eigenvalue, the constant mode)
        safe = jnp.where(jnp.abs(z) < 1e-12, 1.0, z)
        phi1 = jnp.where(jnp.abs(z) < 1e-12, 1.0 + 0.5 * z, jnp.expm1(safe) / safe)
        scale = jnp.exp(z) + phi1
        hhat = jnp.einsum("nk,btnc->btkc", u, h)
        return jnp.einsum("nk,btkc->btnc", u, hhat * scale)

    def _gated_tcn(self, name, x, dim_in, dim_out):
        """tanh(P) * sigmoid(Q) temporal conv, trims kt-1 steps, residual."""
        slices = _temporal_slices(x, self.kt)
        wk = self.param("{}_kernel".format(name),
                        lambda k, s=(self.kt, dim_in, 2 * dim_out):
                        torch_style_init(k, s))
        wb = self.param("{}_bias".format(name),
                        lambda k, s=(2 * dim_out,): jnp.zeros(s))
        y = sum(s @ wk[j].astype(x.dtype) for j, s in enumerate(slices))
        y = y + wb.astype(x.dtype)
        p, q = jnp.split(y, 2, axis=-1)
        out = jnp.tanh(p) * jax.nn.sigmoid(q)
        if dim_in == dim_out:
            out = out + x[:, self.kt - 1:]
        return out

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, n, _f = x.shape
        shrink = 2 * (self.kt - 1)
        if t <= shrink:
            raise ValueError(
                "input window too short for a TCN-ODE-TCN block of kt={}".format(self.kt))
        h = x[..., : self.input_dim]
        wk, wb = _linear(self, "lift", self.input_dim, self.hidden_dim)
        h = h @ wk + wb  # (B, T, N, C)

        sup_np = np.asarray(self.supports, np.float32)  # static module attr
        sup = jnp.asarray(sup_np, h.dtype)  # (2, N, N)
        # Eigendecompose each (symmetric) support ONCE on the host at trace
        # time; the spectral path then solves the linear ODE exactly with
        # two matmuls per block. An asymmetric support (possible for a
        # directed .rel spatial graph) has no orthogonal eigenbasis — those
        # views fall back to RK4.
        eig = [None] * sup_np.shape[0]
        if self.ode_solver == "spectral":
            for v in range(sup_np.shape[0]):
                a64 = np.asarray(sup_np[v], np.float64)
                if np.allclose(a64, a64.T, atol=1e-6):
                    lam, u = np.linalg.eigh(a64)
                    eig[v] = (jnp.asarray(u, h.dtype), jnp.asarray(lam, h.dtype))
        outs = []
        for v in range(sup.shape[0]):
            for blk in range(self.num_blocks):
                name = "v{}b{}".format(v, blk)
                z = self._gated_tcn(name + "_t1", h, self.hidden_dim, self.hidden_dim)
                if eig[v] is not None:
                    z = self._ode_spectral(name + "_ode", z, *eig[v])
                else:
                    z = self._ode_rk4(name + "_ode", z, sup[v])
                z = self._gated_tcn(name + "_t2", z, self.hidden_dim, self.hidden_dim)
                outs.append(z)
        agg = jnp.max(jnp.stack(outs), axis=0)  # (B, T', N, C)

        t_rem = agg.shape[1]
        flat = jnp.transpose(agg, (0, 2, 1, 3)).reshape(b, n, t_rem * self.hidden_dim)
        w1, b1 = _linear(self, "head1", t_rem * self.hidden_dim, self.head_dim)
        w2, b2 = _linear(self, "head2", self.head_dim,
                         self.output_window * self.output_dim)
        y = jax.nn.relu(flat @ w1 + b1) @ w2 + b2
        y = y.reshape(b, n, self.output_window, self.output_dim)
        return y.transpose(0, 2, 1, 3)


def build_stgode(config, data_feature) -> STGODE:
    adj = np.asarray(data_feature.get("adj_mx"), np.float32)
    n = data_feature.get("num_nodes", len(adj))
    profiles = data_feature.get("node_profiles")
    if profiles is None:
        # Without per-node activity profiles (dataset classes that don't
        # expose them), fall back to the adjacency rows as the similarity
        # signature — preserving "semantically similar nodes couple".
        profiles = adj
    dist = dtw_profile_distances(np.asarray(profiles, np.float32),
                                 band=int(config.get("stgode_dtw_band", 4)))
    sem = semantic_adjacency_from_dtw(dist, float(config.get("stgode_sparsity", 0.1)))
    supports = np.stack([_sym_norm_with_self_loops(adj),
                         _sym_norm_with_self_loops(sem)])
    return STGODE(
        supports=supports,
        output_window=config.get("output_window", 1),
        output_dim=data_feature.get("output_dim", 1),
        input_dim=data_feature.get("feature_dim", 1),
        hidden_dim=config.get("rnn_units", 64),
        kt=config.get("kt", 3),
        num_blocks=config.get("stgode_blocks", 3),
        ode_steps=config.get("ode_steps", 6),
        head_dim=config.get("stgode_head_dim", 128),
        ode_solver=config.get("stgode_solver", "spectral"),
    )
