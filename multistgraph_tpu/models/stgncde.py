"""STG-NCDE — Spatio-Temporal Graph Neural Controlled Differential Equation
(clean-room).

Paper-only comparison model: the reference paper's comparison set includes
STG-NCDE (SURVEY.md §6; Implementation details.pdf p.1-2) but the repo
ships no implementation. Implemented per Choi et al., AAAI 2022 ("Graph
Neural Controlled Differential Equations for Traffic Forecasting") on the
framework model API: (B, Tin, N, F) -> (B, Tout, N, output_dim).

Two stacked CDEs driven by a control path X(t) interpolating the input
series over t in [0, Tin-1]:

  temporal:  dh/dt = f(h(t)) · Ẋ(t)        f: (B,N,Dh) -> (B,N,Dh,Fin)
  spatial:   dz/dt = g(z(t)) · ḣ(t)        g: (B,N,Dh) -> (B,N,Dh,Dh)

f is a shared per-node MLP (tanh head, the paper's FinalTanh); g runs an
AGCRN-style adaptive Chebyshev graph convolution — learned node embeddings
E, adjacency softmax(relu(E Eᵀ)), node-conditioned weight pools — so
spatial mixing happens inside the vector field. The horizon head maps
z(Tin-1) to all output steps at once.

TPU design: both CDEs integrate jointly in ONE ``lax.scan`` over
(Tin-1) × substeps RK4 stages — static shapes, constant memory in time, and
every stage is batched MXU matmuls ((N,N) graph products + weight-pool
einsums). Ẋ(t) is piecewise constant within each interval, so RK4 stages
reuse one gathered slope per step.

Both of the official control paths are supported: ``control='cubic'`` —
the paper's natural cubic spline, whose tridiagonal system solves as a
Thomas-algorithm ``lax.scan`` (``natural_cubic_coeffs``) with Ẋ(t)
evaluated analytically per RK4 stage — and ``control='linear'`` (the
default; torchcde's linear mode, Ẋ piecewise constant, same information
content at a quarter of the coefficient footprint). The two CDEs integrate
jointly in lockstep (the official code also solves them as one augmented
system).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from multistgraph_tpu.models.initializers import dense_kernel_init, torch_style_init


def natural_cubic_coeffs(xx):
    """Per-interval derivative coefficients of the natural cubic spline
    through xx:(B, T, N, F) at unit knots.

    Returns (b, c, d), each (T-1, B, N, F), with
    Ẋ(i + s) = b_i + 2 c_i s + 3 d_i s² for s in [0, 1].
    Second derivatives M solve the tridiagonal system
    M_{i-1} + 4 M_i + M_{i+1} = 6 (y_{i+1} - 2 y_i + y_{i-1}), M_0 = M_T = 0
    via the Thomas algorithm — forward sweep and back substitution are each
    one ``lax.scan`` over time, vectorized over every series.
    """
    y = jnp.transpose(xx, (1, 0, 2, 3))  # (T, B, N, F)
    t = y.shape[0]
    if t == 2:  # no interior knots: the spline degenerates to the chord
        return y[1:] - y[:-1], jnp.zeros_like(y[:-1]), jnp.zeros_like(y[:-1])
    rhs = 6.0 * (y[2:] - 2.0 * y[1:-1] + y[:-2])  # (T-2, ...)

    def fwd(carry, r):
        cp, dp = carry  # c' and d' of the previous row
        denom = 4.0 - cp
        cp_new = 1.0 / denom
        dp_new = (r - dp) / denom
        return (cp_new, dp_new), (cp_new, dp_new)

    zero = jnp.zeros_like(rhs[0])
    _, (cps, dps) = jax.lax.scan(fwd, (zero, zero), rhs)

    def back(m_next, cd):
        cp, dp = cd
        m = dp - cp * m_next
        return m, m

    _, ms = jax.lax.scan(back, zero, (cps, dps), reverse=True)
    m = jnp.concatenate([zero[None], ms, zero[None]])  # (T, ...) with M_0=M_T=0
    b = (y[1:] - y[:-1]) - (2.0 * m[:-1] + m[1:]) / 6.0
    c = m[:-1] / 2.0
    d = (m[1:] - m[:-1]) / 6.0
    return b, c, d


class STGNCDE(nn.Module):
    """Stacked temporal + spatial neural CDEs with an adaptive graph field."""

    num_nodes: int
    output_window: int
    output_dim: int
    input_dim: int = 1
    hidden_dim: int = 64
    field_dim: int = 64
    embed_dim: int = 10
    cheb_k: int = 2
    substeps: int = 1
    control: str = "linear"  # "linear" | "cubic" (natural cubic spline)
    compute_dtype: Any = None  # e.g. "bfloat16" — field matmuls only, f32 accum

    @property
    def start_dim(self) -> int:
        return 0

    @property
    def end_dim(self) -> int:
        return self.output_dim

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, n, _f = x.shape
        if t < 2:
            raise ValueError("STG-NCDE needs at least 2 input steps")
        dh, fin = self.hidden_dim, self.input_dim
        xx = x[..., :fin]

        # initial lifts h(0), z(0) from X(0) (paper eq. 7: FC of first obs)
        w0h, b0h = self._lin("init_h", fin, dh)
        w0z, b0z = self._lin("init_z", fin, dh)
        h0 = xx[:, 0] @ w0h + b0h
        z0 = xx[:, 0] @ w0z + b0z

        # temporal field f: MLP, tanh head, outputs (Dh, Fin) per node
        wf1, bf1 = self._lin("f1", dh, self.field_dim)
        wf2, bf2 = self._lin("f2", self.field_dim, self.field_dim)
        wf3, bf3 = self._lin("f3", self.field_dim, dh * fin)

        def f(h):
            y = jax.nn.relu(h @ wf1 + bf1)
            y = jax.nn.relu(y @ wf2 + bf2)
            y = jnp.tanh(y @ wf3 + bf3)
            return y.reshape(b, n, dh, fin)

        # spatial field g: adaptive Chebyshev graph conv with node pools,
        # tanh head, outputs (Dh, Dh) per node
        emb = self.param("node_emb",
                         lambda k, s=(n, self.embed_dim): torch_style_init(k, s))
        adapt = jax.nn.softmax(jax.nn.relu(emb @ emb.T), axis=1)
        sups = [jnp.eye(n, dtype=x.dtype), adapt.astype(x.dtype)]
        for _ in range(2, self.cheb_k):
            sups.append(2.0 * sups[1] @ sups[-1] - sups[-2])
        supports = jnp.stack(sups[: max(self.cheb_k, 1)])  # (K, N, N)
        wg1, bg1 = self._lin("g1", dh, self.field_dim)
        pool = self.param(
            "g_pool",
            lambda k, s=(self.embed_dim, self.cheb_k, self.field_dim, dh * dh):
            torch_style_init(k, s))
        bias_pool = self.param(
            "g_bias_pool",
            lambda k, s=(self.embed_dim, dh * dh): torch_style_init(k, s))
        # The naive evaluation order materializes the per-node weight pool
        # emb @ pool -> (N, K, I, Dh**2) — 497 MB at DC-237 defaults — and
        # streams it from HBM at EVERY RK4 stage as N tiny grouped matmuls
        # (M = B = 16, ~12% MXU row occupancy). Reassociating the same
        # multilinear contraction to fold emb into the ACTIVATIONS instead
        # (out[b,n,o] = sum_{k,i,d} yg[b,k,n,i]·emb[n,d]·pool[d,k,i,o])
        # turns each stage into one dense (B·N, K·I·D) @ (K·I·D, Dh**2)
        # matmul: full MXU rows, and only the ~21 MB generator `pool` ever
        # leaves HBM.
        cdtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        pool_mat = jnp.transpose(pool, (1, 2, 0, 3)).reshape(
            self.cheb_k * self.field_dim * self.embed_dim, dh * dh)
        bpool = emb @ bias_pool
        if cdtype is not None:
            pool_mat = pool_mat.astype(cdtype)
            emb_c = emb.astype(cdtype)
        else:
            emb_c = emb

        def g(z):
            y = jax.nn.relu(z @ wg1 + bg1)
            yg = jnp.einsum("knm,bmc->bknc", supports, y)
            if cdtype is not None:
                yg = yg.astype(cdtype)
            yge = jnp.einsum("bkni,nd->bnkid", yg, emb_c).reshape(b, n, -1)
            y = jnp.einsum("bnj,jo->bno", yge, pool_mat,
                           preferred_element_type=jnp.float32) + bpool
            return jnp.tanh(y).reshape(b, n, dh, dh)

        def field(state, dxdt):
            h, z = state
            dhdt = jnp.einsum("bndf,bnf->bnd", f(h), dxdt)
            dzdt = jnp.einsum("bnde,bne->bnd", g(z), dhdt)
            return dhdt, dzdt

        dt = jnp.asarray(1.0 / self.substeps, x.dtype)
        if self.control == "cubic":
            # Ẋ(i + s) = b_i + 2 c_i s + 3 d_i s² from the natural spline
            bc, cc, dc = natural_cubic_coeffs(xx)  # each (T-1, B, N, F)
            xs = (bc, cc, dc)

            def dx_at(coeffs, s):
                bi, ci, di = coeffs
                return bi + 2.0 * ci * s + 3.0 * di * (s * s)
        else:
            # piecewise-linear control: Ẋ constant on [i, i+1)
            xs = (jnp.transpose(xx[:, 1:] - xx[:, :-1], (1, 0, 2, 3)),)

            def dx_at(coeffs, s):
                return coeffs[0]

        def step(state, coeffs):
            def substep(st, r):
                h, z = st
                s0 = r * dt
                k1 = field((h, z), dx_at(coeffs, s0))
                dx_mid = dx_at(coeffs, s0 + 0.5 * dt)
                k2 = field((h + 0.5 * dt * k1[0], z + 0.5 * dt * k1[1]), dx_mid)
                k3 = field((h + 0.5 * dt * k2[0], z + 0.5 * dt * k2[1]), dx_mid)
                k4 = field((h + dt * k3[0], z + dt * k3[1]), dx_at(coeffs, s0 + dt))
                h = h + (dt / 6.0) * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
                z = z + (dt / 6.0) * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
                return (h, z), None

            st, _ = jax.lax.scan(substep, state,
                                 jnp.arange(self.substeps, dtype=x.dtype))
            return st, None

        # Rematerialize each integration step on the backward pass: without
        # this, reverse-mode AD stacks every RK4 stage's (B, N, Dh, Dh)
        # field tensor across all T-1 steps (~18.6 GB at B=16/N=237/Dh=64 —
        # over a v5e chip's 15.75 GB HBM). Saving only the (B, N, Dh)
        # carries and recomputing the stages costs one extra forward of the
        # step body, the classic TPU FLOPs-for-HBM trade. prevent_cse=False:
        # the checkpointed body sits directly under lax.scan, which already
        # rules out the CSE that the default optimization barriers guard
        # against — the barriers would only inhibit XLA fusion.
        (hT, zT), _ = jax.lax.scan(
            jax.checkpoint(step, prevent_cse=False), (h0, z0), xs)
        del hT

        wo, bo = self._lin("head", dh, self.output_window * self.output_dim)
        out = zT @ wo + bo  # (B, N, Tout*D)
        return out.reshape(b, n, self.output_window,
                           self.output_dim).transpose(0, 2, 1, 3)

    def _lin(self, name, dim_in, dim_out):
        wk = self.param("{}_kernel".format(name),
                        lambda k, s=(dim_in, dim_out): dense_kernel_init(k, s))
        wb = self.param("{}_bias".format(name),
                        lambda k, s=(dim_out,): jnp.zeros(s))
        return wk, wb


def build_stgncde(config, data_feature) -> STGNCDE:
    return STGNCDE(
        num_nodes=data_feature.get("num_nodes", 1),
        output_window=config.get("output_window", 1),
        output_dim=data_feature.get("output_dim", 1),
        input_dim=data_feature.get("feature_dim", 1),
        hidden_dim=config.get("rnn_units", 64),
        field_dim=config.get("ncde_field_dim", 64),
        embed_dim=config.get("embed_dim_node", 10),
        cheb_k=config.get("cheb_order", 2),
        substeps=config.get("ncde_substeps", 1),
        control=config.get("ncde_control", "linear"),
        compute_dtype=config.get("compute_dtype", None),
    )
