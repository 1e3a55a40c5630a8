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
from multistgraph_tpu.ops.precision import round_cotangent
from multistgraph_tpu.ops.spmm import (
    bsr_transpose,
    sddmm_relu,
    sparse_row_softmax,
    sparse_row_softmax_dense_corrected,
    spmm,
    spmm_pret,
)
from multistgraph_tpu.ops.spmm_boundary import (
    boundary_adaptive_band_values,
    boundary_adaptive_values,
    boundary_aggregate,
)


def _xavier(shape):
    def init(key, _shape=None, dtype=jnp.float32):
        return torch_style_init(key, shape, dtype)
    return init


def _as_support_dict(support):
    """A static support is a plain BSR triple (values, row, col) or a
    mapping that additionally carries hybrid-split parts (ops/hybrid.py):
    hub_values/hub_cols (dense skinny hub columns), tail_w/tail_src/tail_dst
    (scattered COO tail), and/or band_values + band_offsets_static
    (ops/band.py offset diagonals). Keys ending in `_static` hold host-side
    numpy metadata that must stay STATIC under jit (e.g. band offsets select
    slice positions) — they are read from the module attribute directly, not
    turned into graph-collection variables. Mapping, not dict: flax converts
    dict attributes to FrozenDict."""
    import collections.abc

    if isinstance(support, collections.abc.Mapping):
        return support
    values, row, col = support
    return {"values": values, "row": row, "col": col}


class SparseATGCN(nn.Module):
    """Input x: (B, T, N_pad, F) -> (B, Tout, N_pad, output_dim).

    Two graph backends:
      * single-chip: `supports` BSR triples aggregated with ops/spmm.py;
      * multi-chip (BASELINE.json config 5): `dist_plan` holds a
        BoundaryShardedBSR — the graph edge-partitioned by destination row
        over `dist_mesh`'s `dist_axis`; every aggregation becomes ONE
        boundary all_to_all + local/remote SpMM pair (ops/spmm_boundary.py)
        under shard_map, with activations node-sharded throughout the scan.
        Parameter names and shapes are IDENTICAL between backends, so a
        single-chip checkpoint trains on verified numerics multi-chip
        (tests/test_sparse_dist.py asserts step-for-step equality).
    """

    num_nodes: int                 # padded to a block multiple
    output_window: int
    output_dim: int
    hidden_dim: int
    num_layers: int
    embed_dim_adj: int
    # static BSR supports: tuple of (values, row_of, col_of) device arrays
    supports: Tuple[Any, ...] = ()
    # block pattern for the adaptive view (row_of, col_of); None disables it.
    # In distributed mode any truthy value enables the adaptive view (the
    # pattern itself lives in dist_plan).
    adaptive_pattern: Any = None
    node_conditioned: str = "off"  # 'off' | 'factored'
    embed_dim_node: int = 8
    block: int = 128
    remat: bool = False
    interpret: bool = False        # run Pallas kernels in interpreter mode (tests)
    # adaptive-view row normalization: 'sampled' (softmax over sampled edges
    # only) or 'dense_corrected' (EXACT reference softmax(relu(E1 E2^T))
    # semantics incl. absent-edge exp(0) terms, via a rank-1 background —
    # see ops/spmm.py:sparse_row_softmax_dense_corrected)
    adaptive_softmax: str = "sampled"
    # multi-chip edge-partitioned backend:
    dist_plan: Any = None          # BoundaryShardedBSR, or None (single-chip)
    dist_mesh: Any = None          # jax.sharding.Mesh with dist_axis
    dist_axis: str = "node"
    # mixed precision: cast activations, graph value streams, and weight
    # pools to this dtype at use (params/optimizer stay f32; the adaptive
    # softmax normalizes in f32). 'bfloat16' halves the dominant HBM
    # streams — at 1M nodes it is what makes a TRAINING step fit in a
    # v5e's 16 GB at all (docs/DESIGN.md §4). attach_graph also STORES the
    # float graph arrays in this dtype so the footprint drops, not just
    # the stream.
    compute_dtype: Any = None

    @property
    def distributed(self) -> bool:
        return self.dist_plan is not None

    @property
    def num_supports(self) -> int:
        n_static = 1 if self.distributed else len(self.supports)
        return 1 + n_static + (1 if self.adaptive_pattern is not None else 0)

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
        if self.distributed:
            self._bnd_vars = {
                key: self.variable(
                    "graph", "bnd_{}".format(key),
                    lambda s=arr.shape, d=arr.dtype: jnp.zeros(s, d),
                )
                for key, arr in self.dist_plan.graph_arrays().items()
            }
        else:
            self._support_vars = [
                {
                    part: self.variable(
                        "graph", "support{}_{}".format(i, part),
                        lambda s=arr.shape, d=arr.dtype: jnp.zeros(s, d),
                    )
                    for part, arr in _as_support_dict(support).items()
                    if not part.endswith("_static")
                }
                for i, support in enumerate(self.supports)
            ]
            self._support_static = [
                {part: arr for part, arr in _as_support_dict(s).items()
                 if part.endswith("_static")}
                for s in self.supports
            ]
        if self.adaptive_pattern is not None:
            if not self.distributed:
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
        arrays (device_put once, outside any compiled program; distributed
        arrays land pre-sharded over the node mesh axis)."""
        graph = dict(variables.get("graph", {}))

        def cast(a):
            a = jnp.asarray(a)
            if self.compute_dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
                return a.astype(self.compute_dtype)
            return a

        if self.distributed:
            sharding = jax.sharding.NamedSharding(
                self.dist_mesh, jax.sharding.PartitionSpec(self.dist_axis)
            )
            for key, arr in self.dist_plan.graph_arrays().items():
                graph["bnd_" + key] = jax.device_put(cast(arr), sharding)
            return {**variables, "graph": graph}
        for i, support in enumerate(self.supports):
            for part, arr in _as_support_dict(support).items():
                if not part.endswith("_static"):
                    graph["support{}_{}".format(i, part)] = cast(arr)
        if self.adaptive_pattern is not None:
            graph["adaptive_row"] = jnp.asarray(self.adaptive_pattern[0])
            graph["adaptive_col"] = jnp.asarray(self.adaptive_pattern[1])
        return {**variables, "graph": graph}

    def _bnd_arrays(self):
        return {key: var.value for key, var in self._bnd_vars.items()}

    def _cast(self, a):
        return a.astype(self.compute_dtype) if self.compute_dtype is not None else a

    def _adaptive_values(self):
        e1, e2 = self._cast(self._e1), self._cast(self._e2)
        if self.distributed:
            if self.dist_plan.band_values is not None:
                vals, background = boundary_adaptive_band_values(
                    e1, e2, self.dist_mesh, axis=self.dist_axis,
                    block=self.block,
                    band_offsets=self.dist_plan.band_offsets,
                    dense_corrected=self.adaptive_softmax == "dense_corrected",
                    num_nodes=self.num_nodes,
                )
                return ("band", vals, background)
            return boundary_adaptive_values(
                self._bnd_arrays(), e1, e2, self.dist_mesh,
                axis=self.dist_axis, block=self.block, interpret=self.interpret,
                dense_corrected=self.adaptive_softmax == "dense_corrected",
                num_nodes=self.num_nodes,
            )
        row_of = jax.lax.stop_gradient(self._adaptive_vars[0].value)
        col_of = jax.lax.stop_gradient(self._adaptive_vars[1].value)
        scores = sddmm_relu(
            e1, e2, row_of, col_of, block=self.block, interpret=self.interpret
        )
        n_row_blocks = self.num_nodes // self.block
        # scores arrive in the compute dtype (the sampled-matmul kernel emits
        # bf16 under mixed precision); both softmaxes normalize with f32 row
        # sums internally, so no f32 (nnz, b, b) array ever materializes
        if self.adaptive_softmax == "dense_corrected":
            vals, background = sparse_row_softmax_dense_corrected(
                scores, row_of, n_row_blocks, self.num_nodes
            )
            return self._cast(vals), row_of, col_of, self._cast(background)
        vals = sparse_row_softmax(scores, row_of, n_row_blocks)
        return self._cast(vals), row_of, col_of, None

    def _precompute_transposes(self, adaptive):
        """Block transposes of every loop-invariant BSR operand, computed
        ONCE per forward (outside the scans) and threaded into spmm_pret —
        plain spmm's backward would otherwise re-derive them (argsort +
        gather + ~GB tile copy at 1M nodes) inside EVERY scan step, the
        measured HBM-OOM driver at the 1M scale point (docs/DESIGN.md §4).
        Returns (per-support pre_t list, adaptive pre_t)."""
        nb = self.num_nodes // self.block
        sg = jax.lax.stop_gradient
        support_prets = []
        for sv in self._support_vars:
            if "values" in sv and sv["values"].value.shape[0] > 0:
                support_prets.append(tuple(sg(a) for a in bsr_transpose(
                    sv["values"].value, sv["row"].value, sv["col"].value, nb)))
            else:
                support_prets.append(None)
        adaptive_pret = None
        if adaptive is not None:
            a_vals, a_row, a_col, _ = adaptive
            adaptive_pret = tuple(sg(a) for a in bsr_transpose(
                a_vals, a_row, a_col, nb))
        return support_prets, adaptive_pret

    def _aggregate(self, x_flat, adaptive, support_prets=None, adaptive_pret=None):
        """x_flat (N_pad, F) -> (K, N_pad, F): identity + each support applied."""
        if self.distributed:
            band_adp = None
            if adaptive is not None and isinstance(adaptive[0], str):
                band_adp, adaptive = (adaptive[1], adaptive[2]), None
            # fold the (f32-accumulated) aggregation back to the compute
            # dtype, exactly as the single-chip branch does below — without
            # this the scan carry promotes to f32 under bf16 compute
            return boundary_aggregate(
                self._bnd_arrays(), x_flat, self.dist_mesh, axis=self.dist_axis,
                block=self.block, adaptive_values=adaptive, interpret=self.interpret,
                band_offsets=self.dist_plan.band_offsets,
                band_radius=self.dist_plan.band_radius,
                adaptive_band=band_adp,
            ).astype(x_flat.dtype)
        if support_prets is None:
            support_prets = [None] * len(self._support_vars)

        def bsr_apply(vals, row, col, pre_t):
            if pre_t is not None:
                return spmm_pret(vals, pre_t, row, col, x_flat,
                                 block=self.block, interpret=self.interpret)
            return spmm(vals, row, col, x_flat, block=self.block,
                        interpret=self.interpret)

        outs = [x_flat]
        for sv, static, pre_t in zip(self._support_vars, self._support_static,
                                     support_prets):
            part = lambda k: jax.lax.stop_gradient(sv[k].value)
            y = None
            if "band_packed" in sv:
                # pre-packed slab form (graph_band_packed): one MXU dot per
                # output tile against a contiguous x window — the measured
                # serving fast path at 1M nodes (ops/band.py, docs/DESIGN §4)
                from multistgraph_tpu.ops.band import spmm_band_packed

                y = spmm_band_packed(
                    part("band_packed"), static["band_radius_static"],
                    x_flat, block=self.block).astype(x_flat.dtype)
            elif "band_values" in sv:
                from multistgraph_tpu.ops.band import spmm_band

                y = spmm_band(part("band_values"),
                              static["band_offsets_static"], x_flat,
                              block=self.block).astype(x_flat.dtype)
            if "values" in sv and sv["values"].value.shape[0] > 0:
                yb = bsr_apply(part("values"), part("row"), part("col"), pre_t)
                y = yb if y is None else y + yb
            if y is None:  # split left nothing dense (pure hub/tail support)
                y = jnp.zeros_like(x_flat)
            if "hub_values" in sv:
                # dense skinny hub columns: y += A[:, hubs] @ x[hubs]
                y = y + (part("hub_values")
                         @ jnp.take(x_flat, part("hub_cols"), axis=0)
                         ).astype(y.dtype)
            if "tail_w" in sv:
                from multistgraph_tpu.ops.hybrid import spmm_tail

                y = y + spmm_tail(
                    part("tail_w"), part("tail_src"), part("tail_dst"),
                    x_flat, x_flat.shape[0]).astype(y.dtype)
            outs.append(y)
        if adaptive is not None:
            a_vals, a_row, a_col, background = adaptive
            y = bsr_apply(a_vals, a_row, a_col, adaptive_pret)
            if background is not None:
                # rank-1 exp(0) background of the dense reference softmax
                y = y + background.reshape(-1, 1) * x_flat.sum(axis=0, keepdims=True)
            outs.append(y)
        # the Pallas kernels accumulate f32; fold back to the compute dtype
        # so the stack (and everything downstream in the scan) stays narrow
        return jnp.stack([o.astype(x_flat.dtype) for o in outs], axis=0)

    def _mix(self, h_stack, cell):
        """h_stack (K, N, B, C) -> (N, B, out) through the (node-)weight pool."""
        if self.node_conditioned == "factored":
            # per-expert contraction, then node-embedding mix:
            # U[n,b,d,o] = sum_{k,i} H[k,n,b,i] P[d,k,i,o]; out = sum_d e[n,d] U
            u = jnp.einsum("knbi,dkio->nbdo", h_stack, self._cast(cell["pool"]))
            emb = self._cast(self._node_emb)
            out = jnp.einsum("nbdo,nd->nbo", u, emb)
            bias = emb @ self._cast(cell["bias"])  # (N, out)
            return out + bias[:, None, :]
        # Shared pool: sum of K full-row 2D dots, NOT one 'knbi,kio->nbo'
        # einsum — XLA lowers that einsum to n-batched dots with B rows per
        # node, putting 1-2-row operands in 8-sublane MXU tiles at serving
        # batch sizes (the measured 1M predict bottleneck, DESIGN.md §10).
        # Each (N*B, I) @ (I, O) dot has full 128-row tiles; same FLOPs and
        # bytes, no transpose (k is the outer stack axis already).
        kk, n, b, ii = h_stack.shape
        pool = self._cast(cell["pool"])
        out = h_stack[0].reshape(n * b, ii) @ pool[0]
        for k in range(1, kk):
            out = out + h_stack[k].reshape(n * b, ii) @ pool[k]
        out = out.reshape(n, b, -1)
        return out + self._cast(cell["bias"][0])[None, None, :]

    # ---------------------------------------------------------------- forward
    def __call__(self, x, train: bool = False):
        b, t, n, f = x.shape
        if n != self.num_nodes:
            raise ValueError("expected padded node dim {}, got {}".format(self.num_nodes, n))
        adaptive = self._adaptive_values() if self.adaptive_pattern is not None else None
        hdim = self.hidden_dim
        if self.distributed:
            support_prets, adaptive_pret = None, None
        else:
            support_prets, adaptive_pret = self._precompute_transposes(adaptive)

        # (T, N, B, C) layout: SpMM consumes (N_pad, feat) with feat = B*C.
        current = jnp.transpose(self._cast(x), (1, 2, 0, 3))

        for layer_idx, cell in enumerate(self._layers):
            dim_in = current.shape[-1]

            # Hoist the input-part aggregation over all timesteps.
            flat = current.reshape(t, n, b * dim_in).transpose(1, 0, 2).reshape(n, t * b * dim_in)
            agg_x = self._aggregate(flat, adaptive, support_prets, adaptive_pret)  # (K, N, T*B*C)
            k = agg_x.shape[0]
            agg_x = (
                agg_x.reshape(k, n, t, b, dim_in).transpose(2, 0, 1, 3, 4)
            )  # (T, K, N, B, C)

            pool_g = cell["gate"]
            pool_u = cell["update"]

            def step(hstate, inputs, pool_g=pool_g, pool_u=pool_u, dim_in=dim_in):
                agg_x_t = inputs  # (K, N, B, C)
                if self.compute_dtype is not None:
                    # Under bf16 compute the f32 preferred_element_type dots
                    # hand this stack an f32 cotangent, and scan's transpose
                    # then allocates its (T, K, N, B, C) input-cotangent
                    # accumulator in f32 — 4.1 GB at 1M nodes, the largest
                    # allocation in the measured OOM (ops/precision.py).
                    agg_x_t = round_cotangent(agg_x_t, self.compute_dtype)
                # gate: aggregate h, concat with hoisted x part along channels
                agg_h = self._aggregate(hstate.reshape(n, b * hdim), adaptive,
                                        support_prets, adaptive_pret)
                agg_h = agg_h.reshape(-1, n, b, hdim)
                z_r = jax.nn.sigmoid(
                    self._mix(jnp.concatenate([agg_x_t, agg_h], axis=-1), pool_g)
                )
                z, r = jnp.split(z_r, 2, axis=-1)
                agg_zh = self._aggregate((z * hstate).reshape(n, b * hdim),
                                         adaptive, support_prets, adaptive_pret)
                agg_zh = agg_zh.reshape(-1, n, b, hdim)
                hc = jnp.tanh(
                    self._mix(jnp.concatenate([agg_x_t, agg_zh], axis=-1), pool_u)
                )
                h_new = r * hstate + (1.0 - r) * hc
                return h_new, h_new

            if self.remat:
                step = jax.checkpoint(step)
            h0 = jnp.zeros((n, b, hdim), current.dtype)
            _, states = jax.lax.scan(step, h0, agg_x)  # (T, N, B, H)
            if self.compute_dtype is not None:
                # Same discipline for the layer-output stack: the f32 head
                # matmul otherwise pads an f32 (T, N, B, H) cotangent out of
                # d(last) — 2 GB at 1M nodes.
                states = round_cotangent(states, self.compute_dtype)
            current = states

        last = current[-1]  # (N, B, H)
        out = last @ self._cast(self._end_kernel) + self._cast(self._end_bias[0])
        out = out.reshape(n, b, self.output_window, self.output_dim)
        # predictions back in f32: the loss/metrics space stays full precision
        return jnp.transpose(out, (1, 2, 0, 3)).astype(jnp.float32)


def init_with_graph(model: SparseATGCN, rng, x):
    """jit-init the model and attach the real graph arrays (direct-use helper;
    the executor performs the same two steps itself)."""
    import jax as _jax

    variables = _jax.jit(lambda k, xx: model.init(k, xx, train=False))(rng, x)
    return model.attach_graph(variables)


def build_sparse_atgcn_from_feature(config, data_feature) -> SparseATGCN:
    """Registry-compatible builder: graph arrives via data_feature['bsr_graph'].

    config['node_parallel']=True selects the edge-partitioned multi-chip
    backend over a mesh of all visible devices (BASELINE.json config 5)."""
    graph = data_feature["bsr_graph"]
    interpret = config.get("pallas_interpret", False)
    if config.get("node_parallel", False):
        import jax as _jax

        from multistgraph_tpu.parallel.mesh import make_mesh

        n_dev = len(_jax.devices())
        if n_dev > 1:
            mesh = data_feature.get("node_mesh") or make_mesh(n_dev, axes=("node",))
            return build_sparse_atgcn_dist(graph, config, mesh, interpret=interpret)
    return build_sparse_atgcn(graph, config, interpret=interpret)


def build_sparse_atgcn_dist(
    graph, config, mesh, axis: str = "node", interpret: bool = False
) -> SparseATGCN:
    """Edge-partitioned multi-chip SparseATGCN over `mesh`'s `axis`.

    Accepts every graph form the single-chip builder does: BSRGraph,
    HybridGraph (hub columns row-sharded + psum-gathered), TailGraph
    (scattered COO edges ride a per-row all_to_all), and BandGraph (offset
    diagonals become a row-sharded stencil with neighbor-halo ppermutes;
    the COO remainder is hub/tail split; the adaptive view is scored
    shard-locally at the band pattern — ops/spmm_boundary.py, round 4).

    Parameter tree is identical to build_sparse_atgcn's for the same config,
    so checkpoints move freely between the single- and multi-chip backends.
    """
    from multistgraph_tpu.ops.hybrid import HybridGraph, TailGraph
    from multistgraph_tpu.ops.spmm_boundary import partition_bsr_boundary

    plan = partition_bsr_boundary(graph, mesh.shape[axis])
    adaptive = config.get("adpadj", "none") != "none"
    if isinstance(graph, (HybridGraph, TailGraph)):
        graph = graph.bsr  # remainder is the BSR core
    padded, block = graph.padded_nodes, graph.block
    return SparseATGCN(
        num_nodes=padded,
        output_window=config.get("output_window", 1),
        output_dim=config.get("output_dim", 1),
        hidden_dim=config.get("rnn_units", 64),
        num_layers=config.get("num_layers", 2),
        embed_dim_adj=config.get("embed_dim_adj", 16),
        supports=(),
        adaptive_pattern=True if adaptive else None,
        node_conditioned=config.get("node_conditioned", "off"),
        embed_dim_node=config.get("embed_dim_node", 8),
        block=block,
        remat=config.get("remat", False),
        interpret=interpret,
        adaptive_softmax=config.get("adaptive_softmax", "sampled"),
        compute_dtype=config.get("compute_dtype", None),
        dist_plan=plan,
        dist_mesh=mesh,
        dist_axis=axis,
    )


def build_sparse_atgcn(graph, config, interpret: bool = False) -> SparseATGCN:
    """Construct from a BSRGraph, HybridGraph (hub-split), or TailGraph
    (scattered-tail split) + config dict.

    With a split graph the static support aggregates through the hybrid
    path (BSR + skinny hub matmul / COO segment-sum tail — 1.68x at the
    1M-node scale point, docs/DESIGN.md §4). The adaptive view samples the
    BSR REMAINDER's block pattern: the extracted hub/tail edges keep their
    static weights but receive no learned adaptive weight (at hub fan-ins
    the dense reference's softmax would spread mass over >10^5 incoming
    edges anyway; documented deviation)."""
    import numpy as _np

    from multistgraph_tpu.ops.band import BandGraph
    from multistgraph_tpu.ops.hybrid import HybridGraph, TailGraph, split_hub_columns

    extra = {}
    adaptive = None
    if isinstance(graph, BandGraph):
        # full structured decomposition: band diagonals + hub columns of the
        # rest + COO tail of the leftovers (docs/DESIGN.md §4 — the fastest
        # 1M-node form). The adaptive view samples the band's block pattern.
        if config.get("graph_band_packed", False):
            # store the band PACKED (R, b, (2r+1)b): the slab kernel's
            # serving fast path consumes it directly (pack once on host —
            # XLA will not hoist an in-program pack out of the scan,
            # measured P4 probe docs/bench/probe_band_integration_r4c.log)
            from multistgraph_tpu.ops.band import pack_band_rows

            radius = int(max(abs(int(o)) for o in graph.offsets)) \
                if len(graph.offsets) else 0
            support = {
                "band_packed": jnp.asarray(pack_band_rows(
                    graph.band_values, graph.offsets, radius)),
                "band_radius_static": radius,
                "band_offsets_static": _np.asarray(graph.offsets),
            }
        else:
            support = {"band_values": jnp.asarray(graph.band_values),
                       "band_offsets_static": _np.asarray(graph.offsets)}
        hy = split_hub_columns(graph.rest_src, graph.rest_dst, graph.rest_w,
                               graph.num_nodes, graph.block)
        if hy.num_hubs > 0:
            support["hub_values"] = jnp.asarray(hy.hub_values)
            support["hub_cols"] = jnp.asarray(hy.hub_cols)
        non_hub = ~_np.isin(graph.rest_dst, hy.hub_cols)
        if non_hub.any():
            order = _np.argsort(graph.rest_src[non_hub], kind="stable")
            support["tail_w"] = jnp.asarray(graph.rest_w[non_hub][order])
            support["tail_src"] = jnp.asarray(
                graph.rest_src[non_hub][order].astype(_np.int32))
            support["tail_dst"] = jnp.asarray(
                graph.rest_dst[non_hub][order].astype(_np.int32))
        if config.get("adpadj", "none") != "none":
            nb = graph.num_row_blocks
            rows, cols = [], []
            for o in graph.offsets:
                r = _np.arange(max(0, -int(o)), min(nb, nb - int(o)))
                rows.append(r)
                cols.append(r + int(o))
            rows = _np.concatenate(rows) if rows else _np.zeros(0, _np.int64)
            cols = _np.concatenate(cols) if cols else _np.zeros(0, _np.int64)
            order = _np.lexsort((cols, rows))  # SpMM wants row-major order
            adaptive = (jnp.asarray(rows[order].astype(_np.int32)),
                        jnp.asarray(cols[order].astype(_np.int32)))
        return SparseATGCN(
            num_nodes=graph.padded_nodes,
            output_window=config.get("output_window", 1),
            output_dim=config.get("output_dim", 1),
            hidden_dim=config.get("rnn_units", 64),
            num_layers=config.get("num_layers", 2),
            embed_dim_adj=config.get("embed_dim_adj", 16),
            supports=(support,),
            adaptive_pattern=adaptive,
            node_conditioned=config.get("node_conditioned", "off"),
            embed_dim_node=config.get("embed_dim_node", 8),
            block=graph.block,
            remat=config.get("remat", False),
            interpret=interpret,
            adaptive_softmax=config.get("adaptive_softmax", "sampled"),
            compute_dtype=config.get("compute_dtype", None),
        )
    if isinstance(graph, HybridGraph):
        extra = {"hub_values": jnp.asarray(graph.hub_values),
                 "hub_cols": jnp.asarray(graph.hub_cols)}
        graph = graph.bsr
    elif isinstance(graph, TailGraph):
        extra = {"tail_w": jnp.asarray(graph.tail_w),
                 "tail_src": jnp.asarray(graph.tail_src),
                 "tail_dst": jnp.asarray(graph.tail_dst)}
        graph = graph.bsr
    support = {"values": jnp.asarray(graph.values),
               "row": jnp.asarray(graph.row_of),
               "col": jnp.asarray(graph.col_of), **extra}
    supports = (support,)
    if config.get("adpadj", "none") != "none":
        row_np, col_np = graph.row_of, graph.col_of
        # adaptive_max_blocks: cap the adaptive view's sampled pattern to the
        # K statically-heaviest blocks. At 1M nodes the full-pattern adaptive
        # tiles + their transpose + the scan-carried gradient accumulator are
        # ~3x (nnz, 128, 128) — the dominant HBM cost of a training step
        # (docs/DESIGN.md §4). The static support still covers EVERY edge;
        # only the learned reweighting concentrates on the heavy blocks
        # (documented deviation from the reference's dense softmax, which a
        # dense N^2 adjacency could never reach at this scale anyway).
        max_blocks = config.get("adaptive_max_blocks", 0)
        if max_blocks and graph.values.shape[0] > max_blocks:
            mass = _np.abs(graph.values).sum(axis=(1, 2))
            keep = _np.sort(_np.argpartition(-mass, max_blocks)[:max_blocks])
            row_np, col_np = row_np[keep], col_np[keep]
        adaptive = (jnp.asarray(row_np), jnp.asarray(col_np))
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
        adaptive_softmax=config.get("adaptive_softmax", "sampled"),
        compute_dtype=config.get("compute_dtype", None),
    )
