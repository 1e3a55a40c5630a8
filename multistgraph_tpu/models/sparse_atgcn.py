"""SparseATGCN: the Multi-ATGCN architecture at 50k-1M-node scale.

Same computational structure as models/multi_atgcn.py — multi-support graph
convolution inside GRU gates, learned adaptive adjacency, scan over time —
re-based on block-sparse kernels for graphs where dense N x N supports are
impossible (BASELINE.json configs 4-5):

  * static supports are BSR graphs aggregated with the Pallas SpMM
    (ops/spmm.py);
  * the adaptive view is SDDMM(relu(E1 E2)) sampled at the graph's block
    pattern + sparse row softmax, then SpMM — the sparse analogue of the
    reference's dense softmax(relu(E1 E2^T)) (MultiATGCN.py:80-83);
  * node-conditioned weight pools are factored through the node embedding
    (per-'expert' contraction) instead of materializing per-node weights,
    or shared entirely (`node_conditioned='off'`) at extreme scale;
  * the time recurrence is one lax.scan per layer with optional
    rematerialization (`remat=True`) to fit long sequences in HBM.

The dense model remains the fast path at N<=403; this module is the scale
path and is numerically cross-checked against a dense emulation in tests.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from multistgraph_tpu.models.initializers import dense_kernel_init, torch_style_init
from multistgraph_tpu.ops.spmm import sddmm_relu, sparse_row_softmax, spmm


def _xavier(shape):
    def init(key, _shape=None, dtype=jnp.float32):
        return torch_style_init(key, shape, dtype)
    return init


class SparseATGCN(nn.Module):
    """Input x: (B, T, N_pad, F) -> (B, Tout, N_pad, output_dim)."""

    num_nodes: int                 # padded to a block multiple
    output_window: int
    output_dim: int
    hidden_dim: int
    num_layers: int
    embed_dim_adj: int
    # static BSR supports: tuple of (values, row_of, col_of) device arrays
    supports: Tuple[Any, ...] = ()
    # block pattern for the adaptive view (row_of, col_of); None disables it
    adaptive_pattern: Any = None
    node_conditioned: str = "off"  # 'off' | 'factored'
    embed_dim_node: int = 8
    block: int = 128
    remat: bool = False
    interpret: bool = False        # run Pallas kernels in interpreter mode (tests)

    @property
    def num_supports(self) -> int:
        return 1 + len(self.supports) + (1 if self.adaptive_pattern is not None else 0)

    # target-channel slicing bounds, for executor loss-fn compatibility
    @property
    def start_dim(self) -> int:
        return 0

    @property
    def end_dim(self) -> int:
        return self.output_dim

    def setup(self):
        n, h = self.num_nodes, self.hidden_dim
        ks = self.num_supports
        # Graph arrays live in a non-trainable 'graph' variable collection so
        # they enter compiled programs as ARGUMENTS, not embedded constants —
        # a 50k-node graph's block values are hundreds of MB and constants of
        # that size blow up HLO serialization (and any compile-service limits).
        # They are ZERO-initialized (so init programs stay tiny) and must be
        # populated via attach_graph() after init — the executor does this
        # automatically; direct users should call init_with_graph().
        self._support_vars = [
            tuple(
                self.variable(
                    "graph", "support{}_{}".format(i, part),
                    lambda s=arr.shape, d=arr.dtype: jnp.zeros(s, d),
                )
                for part, arr in zip(("values", "row", "col"), support)
            )
            for i, support in enumerate(self.supports)
        ]
        if self.adaptive_pattern is not None:
            self._adaptive_vars = tuple(
                self.variable(
                    "graph", "adaptive_{}".format(part),
                    lambda s=arr.shape, d=arr.dtype: jnp.zeros(s, d),
                )
                for part, arr in zip(("row", "col"), self.adaptive_pattern)
            )
            self._e1 = self.param("node_vec1", _xavier((n, self.embed_dim_adj)))
            self._e2 = self.param("node_vec2", _xavier((self.embed_dim_adj, n)))
        if self.node_conditioned == "factored":
            self._node_emb = self.param("node_emb", _xavier((n, self.embed_dim_node)))
        layers = []
        for layer in range(self.num_layers):
            dim_in = 1 if layer == 0 else h  # target channel only at scale
            entry = {}
            for name, dim_out in (("gate", 2 * h), ("update", h)):
                if self.node_conditioned == "factored":
                    shape = (self.embed_dim_node, ks, dim_in + h, dim_out)
                else:
                    shape = (ks, dim_in + h, dim_out)
                entry[name] = {
                    "pool": self.param("l{}_{}_pool".format(layer, name), _xavier(shape)),
                    "bias": self.param(
                        "l{}_{}_bias".format(layer, name),
                        _xavier((self.embed_dim_node, dim_out))
                        if self.node_conditioned == "factored"
                        else _xavier((1, dim_out)),
                    ),
                }
            layers.append(entry)
        self._layers = layers
        self._end_kernel = self.param(
            "end_kernel", lambda k: dense_kernel_init(k, (h, self.output_window * self.output_dim))
        )
        self._end_bias = self.param("end_bias", _xavier((1, self.output_window * self.output_dim)))

    # -------------------------------------------------------------- supports
    def attach_graph(self, variables):
        """Replace the zero-initialized 'graph' collection with the real
        arrays (device_put once, outside any compiled program)."""
        graph = dict(variables.get("graph", {}))
        for i, support in enumerate(self.supports):
            for part, arr in zip(("values", "row", "col"), support):
                graph["support{}_{}".format(i, part)] = jnp.asarray(arr)
        if self.adaptive_pattern is not None:
            graph["adaptive_row"] = jnp.asarray(self.adaptive_pattern[0])
            graph["adaptive_col"] = jnp.asarray(self.adaptive_pattern[1])
        return {**variables, "graph": graph}

    def _adaptive_values(self):
        row_of = jax.lax.stop_gradient(self._adaptive_vars[0].value)
        col_of = jax.lax.stop_gradient(self._adaptive_vars[1].value)
        scores = sddmm_relu(
            self._e1, self._e2, row_of, col_of, block=self.block, interpret=self.interpret
        )
        n_row_blocks = self.num_nodes // self.block
        return sparse_row_softmax(scores, row_of, n_row_blocks), row_of, col_of

    def _aggregate(self, x_flat, adaptive):
        """x_flat (N_pad, F) -> (K, N_pad, F): identity + each support applied."""
        outs = [x_flat]
        for values_v, row_v, col_v in self._support_vars:
            outs.append(spmm(
                jax.lax.stop_gradient(values_v.value),
                jax.lax.stop_gradient(row_v.value),
                jax.lax.stop_gradient(col_v.value),
                x_flat, block=self.block, interpret=self.interpret,
            ))
        if adaptive is not None:
            a_vals, a_row, a_col = adaptive
            outs.append(spmm(a_vals, a_row, a_col, x_flat, block=self.block,
                             interpret=self.interpret))
        return jnp.stack(outs, axis=0)

    def _mix(self, h_stack, cell):
        """h_stack (K, N, B, C) -> (N, B, out) through the (node-)weight pool."""
        if self.node_conditioned == "factored":
            # per-expert contraction, then node-embedding mix:
            # U[n,b,d,o] = sum_{k,i} H[k,n,b,i] P[d,k,i,o]; out = sum_d e[n,d] U
            u = jnp.einsum("knbi,dkio->nbdo", h_stack, cell["pool"])
            out = jnp.einsum("nbdo,nd->nbo", u, self._node_emb)
            bias = self._node_emb @ cell["bias"]  # (N, out)
            return out + bias[:, None, :]
        out = jnp.einsum("knbi,kio->nbo", h_stack, cell["pool"])
        return out + cell["bias"][0][None, None, :]

    # ---------------------------------------------------------------- forward
    def __call__(self, x, train: bool = False):
        b, t, n, f = x.shape
        if n != self.num_nodes:
            raise ValueError("expected padded node dim {}, got {}".format(self.num_nodes, n))
        adaptive = self._adaptive_values() if self.adaptive_pattern is not None else None
        hdim = self.hidden_dim

        # (T, N, B, C) layout: SpMM consumes (N_pad, feat) with feat = B*C.
        current = jnp.transpose(x, (1, 2, 0, 3))

        for layer_idx, cell in enumerate(self._layers):
            dim_in = current.shape[-1]

            # Hoist the input-part aggregation over all timesteps.
            flat = current.reshape(t, n, b * dim_in).transpose(1, 0, 2).reshape(n, t * b * dim_in)
            agg_x = self._aggregate(flat, adaptive)  # (K, N, T*B*C)
            k = agg_x.shape[0]
            agg_x = (
                agg_x.reshape(k, n, t, b, dim_in).transpose(2, 0, 1, 3, 4)
            )  # (T, K, N, B, C)

            pool_g = cell["gate"]
            pool_u = cell["update"]

            def step(hstate, inputs, pool_g=pool_g, pool_u=pool_u, dim_in=dim_in):
                agg_x_t = inputs  # (K, N, B, C)
                # gate: aggregate h, concat with hoisted x part along channels
                agg_h = self._aggregate(hstate.reshape(n, b * hdim), adaptive)
                agg_h = agg_h.reshape(-1, n, b, hdim)
                z_r = jax.nn.sigmoid(
                    self._mix(jnp.concatenate([agg_x_t, agg_h], axis=-1), pool_g)
                )
                z, r = jnp.split(z_r, 2, axis=-1)
                agg_zh = self._aggregate((z * hstate).reshape(n, b * hdim), adaptive)
                agg_zh = agg_zh.reshape(-1, n, b, hdim)
                hc = jnp.tanh(
                    self._mix(jnp.concatenate([agg_x_t, agg_zh], axis=-1), pool_u)
                )
                h_new = r * hstate + (1.0 - r) * hc
                return h_new, h_new

            if self.remat:
                step = jax.checkpoint(step)
            h0 = jnp.zeros((n, b, hdim), x.dtype)
            _, states = jax.lax.scan(step, h0, agg_x)  # (T, N, B, H)
            current = states

        last = current[-1]  # (N, B, H)
        out = last @ self._end_kernel + self._end_bias[0]  # (N, B, Tout*out)
        out = out.reshape(n, b, self.output_window, self.output_dim)
        return jnp.transpose(out, (1, 2, 0, 3))


def init_with_graph(model: SparseATGCN, rng, x):
    """jit-init the model and attach the real graph arrays (direct-use helper;
    the executor performs the same two steps itself)."""
    import jax as _jax

    variables = _jax.jit(lambda k, xx: model.init(k, xx, train=False))(rng, x)
    return model.attach_graph(variables)


def build_sparse_atgcn_from_feature(config, data_feature) -> SparseATGCN:
    """Registry-compatible builder: graph arrives via data_feature['bsr_graph']."""
    graph = data_feature["bsr_graph"]
    return build_sparse_atgcn(graph, config, interpret=config.get("pallas_interpret", False))


def build_sparse_atgcn(graph, config, interpret: bool = False) -> SparseATGCN:
    """Construct from a BSRGraph (ops/bsr.py) + config dict."""
    supports = ((jnp.asarray(graph.values), jnp.asarray(graph.row_of), jnp.asarray(graph.col_of)),)
    adaptive = None
    if config.get("adpadj", "none") != "none":
        adaptive = (jnp.asarray(graph.row_of), jnp.asarray(graph.col_of))
    return SparseATGCN(
        num_nodes=graph.padded_nodes,
        output_window=config.get("output_window", 1),
        output_dim=config.get("output_dim", 1),
        hidden_dim=config.get("rnn_units", 64),
        num_layers=config.get("num_layers", 2),
        embed_dim_adj=config.get("embed_dim_adj", 16),
        supports=supports,
        adaptive_pattern=adaptive,
        node_conditioned=config.get("node_conditioned", "off"),
        embed_dim_node=config.get("embed_dim_node", 8),
        block=graph.block,
        remat=config.get("remat", False),
        interpret=interpret,
    )
