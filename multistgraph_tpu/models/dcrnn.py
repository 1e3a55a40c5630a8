"""DCRNN — Diffusion Convolutional Recurrent Neural Network (clean-room).

In the reference's comparison set (task_config.json:96, Implementation
details.pdf p.1) but the trimmed repo ships no code; this is a TPU-native
implementation per Li et al., ICLR 2018 ("Diffusion Convolutional Recurrent
Neural Network: Data-Driven Traffic Forecasting") on the framework's model
API: input (B, Tin, N, F) -> (B, Tout, N, output_dim).

Structure: an encoder-decoder of stacked DCGRU cells. A DCGRU cell is a GRU
whose input/state transforms are diffusion convolutions — weighted sums of
powers 1..K of the forward and backward random-walk transition matrices
applied to [x, h]. The decoder rolls the horizon out autoregressively from a
zero GO symbol.

TPU design notes:
  * Both phases are single `lax.scan`s with all layers inside the step
    function (the decoder is autoregressive, so layers cannot be scanned
    separately); supports are a dense (S, N, N) stack at N<=403 — the
    diffusion "spmm" is one einsum feeding one big (B*N, (S*K+1)*C) @ W
    MXU matmul per gate.
  * Scheduled sampling (the paper's curriculum: decoder inputs are ground
    truth with probability eps_i = cl/(cl + exp(i/cl)) decaying over global
    step i) runs INSIDE the single jitted program: the executor threads the
    global step into the epoch scan, the decaying ratio is a traced scalar,
    and the per-(step, sample) coins are one `bernoulli` draw — the rollout
    stays one `lax.scan`, branch-free via `where`. Enabled when
    `cl_decay_steps > 0` (DCRNN's default config sets 2000 like the paper);
    inference is always pure autoregressive.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.models.initializers import dense_kernel_init


class DCRNN(nn.Module):
    """Diffusion-convolutional GRU encoder-decoder."""

    supports: Any  # (S, N, N) stacked transition matrices
    output_window: int
    output_dim: int
    input_dim: int = 1
    hidden_dim: int = 64
    num_layers: int = 2
    max_diffusion_step: int = 2
    # > 0 enables scheduled sampling; the executor computes the decaying
    # teacher-forcing ratio from this constant and the global step
    cl_decay_steps: int = 0

    @property
    def start_dim(self) -> int:
        return 0

    @property
    def end_dim(self) -> int:
        return self.output_dim

    def _dconv_params(self, name, dim_in, dim_out):
        s = len(np.asarray(self.supports))
        width = (s * self.max_diffusion_step + 1) * dim_in
        wk = self.param("{}_kernel".format(name),
                        lambda k, sh=(width, dim_out): dense_kernel_init(k, sh))
        wb = self.param("{}_bias".format(name), lambda k, sh=(dim_out,): jnp.zeros(sh))
        return wk, wb

    def _make_cell(self, name, dim_in):
        """DCGRU cell closure: (state (B,N,H), inp (B,N,dim_in)) -> state."""
        h = self.hidden_dim
        gate_w, gate_b = self._dconv_params("{}_gate".format(name), dim_in + h, 2 * h)
        cand_w, cand_b = self._dconv_params("{}_cand".format(name), dim_in + h, h)

        def dconv(z, wk, wb):
            sup = jnp.asarray(self.supports, z.dtype)
            outs = [z]
            for s in sup:
                zk = z
                for _ in range(self.max_diffusion_step):
                    zk = jnp.einsum("nm,bmc->bnc", s, zk)
                    outs.append(zk)
            zc = jnp.concatenate(outs, axis=-1)
            return zc @ wk + wb

        def cell(state, inp):
            z = jnp.concatenate([inp, state], axis=-1)
            ru = jax.nn.sigmoid(dconv(z, gate_w, gate_b))
            r, u = jnp.split(ru, 2, axis=-1)
            zc = jnp.concatenate([inp, r * state], axis=-1)
            c = jnp.tanh(dconv(zc, cand_w, cand_b))
            return u * state + (1.0 - u) * c

        return cell

    @nn.compact
    def __call__(self, x, train: bool = False, targets=None, tf_ratio=None):
        b, t, n, _f = x.shape
        h = self.hidden_dim
        xin = x[..., : self.input_dim]

        enc_cells = []
        dec_cells = []
        for layer in range(self.num_layers):
            dim_in = self.input_dim if layer == 0 else h
            enc_cells.append(self._make_cell("e{}".format(layer), dim_in))
            dim_in = self.output_dim if layer == 0 else h
            dec_cells.append(self._make_cell("d{}".format(layer), dim_in))
        proj_w, proj_b = (
            self.param("proj_kernel",
                       lambda k, s=(h, self.output_dim): dense_kernel_init(k, s)),
            self.param("proj_bias", lambda k, s=(self.output_dim,): jnp.zeros(s)),
        )

        seq = jnp.transpose(xin, (1, 0, 2, 3))  # (T, B, N, input_dim)
        states0 = tuple(jnp.zeros((b, n, h), x.dtype) for _ in range(self.num_layers))

        def enc_step(states, inp):
            new = []
            for layer, cell in enumerate(enc_cells):
                inp = cell(states[layer], inp)
                new.append(inp)
            return tuple(new), None

        states, _ = jax.lax.scan(enc_step, states0, seq)

        use_ss = (train and targets is not None and tf_ratio is not None
                  and self.has_rng("sampling"))

        def dec_step(carry, xs):
            states, y_prev = carry
            if use_ss:
                truth, coin = xs
                inp = jnp.where(coin, truth, y_prev)
            else:
                inp = y_prev
            new = []
            for layer, cell in enumerate(dec_cells):
                inp = cell(states[layer], inp)
                new.append(inp)
            y = inp @ proj_w + proj_b
            return (tuple(new), y), y

        go = jnp.zeros((b, n, self.output_dim), x.dtype)
        xs = None
        if use_ss:
            # decoder input at step t is the PREVIOUS horizon step's truth
            # with prob tf_ratio (step 0 keeps the GO symbol: its "truth"
            # slot is the GO zeros, so the coin is a no-op there)
            tgt = targets[..., : self.output_dim].astype(x.dtype)
            prev_true = jnp.concatenate([go[:, None], tgt[:, :-1]], axis=1)
            coins = jax.random.bernoulli(
                self.make_rng("sampling"), tf_ratio,
                (self.output_window, b, 1, 1))
            xs = (jnp.transpose(prev_true, (1, 0, 2, 3)), coins)
        _, ys = jax.lax.scan(dec_step, (states, go), xs,
                             length=None if use_ss else self.output_window)
        return jnp.transpose(ys, (1, 0, 2, 3))  # (B, Tout, N, D)


def build_dcrnn(config, data_feature) -> DCRNN:
    from multistgraph_tpu.graph.laplacian import supports_by_filter_type

    adj = np.asarray(data_feature.get("adj_mx"))
    sups = supports_by_filter_type(adj, config.get("filter_type", "dual_random_walk"))
    return DCRNN(
        supports=np.stack([np.asarray(s, np.float32) for s in sups]),
        output_window=config.get("output_window", 1),
        output_dim=data_feature.get("output_dim", 1),
        input_dim=data_feature.get("feature_dim", 1),
        hidden_dim=config.get("rnn_units", 64),
        num_layers=config.get("num_rnn_layers", config.get("num_layers", 2)),
        max_diffusion_step=config.get("max_diffusion_step", 2),
        cl_decay_steps=config.get("cl_decay_steps", 0),
    )
