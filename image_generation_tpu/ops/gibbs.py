"""Colored block-Gibbs sampling for Ising models — TPU-layout core.

This is the TPU-native replacement for the reference's quantum-annealer
negative phase (reference call sites: src/model_wrapper.py:308-316,
src/utils/persistent_qpu_sampler.py:71-78).  Instead of one HTTPS round-trip
to a QPU per batch, sampling is an on-device XLA program.

Layout strategy (the thing that makes it fast on TPU): spins live in a
**color-permuted, padded coordinate system**.  The coupling graph is
properly colored (utils/coloring.py); spins are reordered so each color
class is one contiguous block, padded to a multiple of the 128-lane width.
A color update is then

    fields = S @ A[:, c0:c1] + h[c0:c1]        # one MXU matmul, static slice
    S[:, c0:c1] = bernoulli(σ(−2β·fields))      # static dynamic_update_slice

— no gathers, no scatters, nothing dynamic in the sweep loop.  Because all
spins in a class are mutually non-adjacent, updating them simultaneously is
a valid systematic-scan Gibbs sweep.  Padding slots have zero couplings and
zero fields: they flip coins without influencing anything and are dropped by
``to_original``.

The XLA sweeps step over **class spans** (``class_spans``): the plan splits
oversized color classes into width-capped blocks for the Pallas kernels'
VMEM budgets, but a run of same-class blocks is still one independent set,
so the XLA paths update it in one step — 7 steps per sweep instead of 47 at
the scaled Pegasus config, which divides the dominant HBM term (the full
spin-state re-read per step) and, in the graph-sharded sweep, the per-step
psum count by the same factor.  Spins are carried through the sweep scan in
the matmul dtype (±1 is exact in bf16/int8), halving/quartering that term
again.  The Pallas kernels instead keep spins VMEM-resident across the
whole run and keep the 128/256-wide per-block order.

The permuted coupling matrix/fields are rebuilt from the (traced) GRBM
parameters each refresh via static-index scatters (edge indices are
compile-time constants), costing about one sweep's worth of memory traffic.

Chains are batched along the leading axis (the reference's ``num_reads``
becomes the chain count) and row-sharding them over a mesh axis is
communication-free.  Parallel tempering runs a β ladder with even/odd-pair
replica exchange for stiff models.
"""

from __future__ import annotations

import weakref
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.ops.quant import QuantCoupling
from image_generation_tpu.utils.coloring import greedy_coloring

__all__ = [
    "GibbsPlan",
    "build_plan",
    "class_spans",
    "permuted_model",
    "gibbs_sweeps",
    "random_spins",
    "to_original",
    "ising_energies",
    "pt_round",
    "pt_sample",
]


@dataclass(frozen=True)
class GibbsPlan:
    """Static sampling plan: the color-permuted coordinate system.

    Attributes:
      n: number of real spins.
      n_pad: padded length (Σ per-color padded block sizes).
      blocks: tuple of (start, valid_stop, padded_stop) per color.
      orig_to_perm: (n,) padded position of each original spin.
      perm_edge_i/j: (E,) edge endpoints in padded coordinates.
      valid_mask: (n_pad,) True at real-spin positions.
      block_class: per-block color-class id (None for hand-built plans:
        every block is then its own class — the pre-span behavior).
        ``build_plan`` splits oversized classes into ≤ max_class blocks
        for the Pallas kernels' VMEM budgets; blocks from the same class
        stay a single independent set, so the XLA sweeps may update a
        whole run of them per step (``class_spans``).

    Hashable by identity so jitted samplers can close over it.
    """

    n: int
    n_pad: int
    blocks: tuple
    orig_to_perm: np.ndarray
    perm_edge_i: np.ndarray
    perm_edge_j: np.ndarray
    valid_mask: np.ndarray
    block_class: Optional[tuple] = None

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    @property
    def n_colors(self) -> int:
        return len(self.blocks)


# weak-keyed: an lru_cache here would pin every plan (and its numpy arrays)
# for process lifetime — unbounded growth in a warm server that swaps models
_class_spans_cache: "weakref.WeakKeyDictionary[GibbsPlan, tuple]" = (
    weakref.WeakKeyDictionary()
)


def class_spans(plan: "GibbsPlan") -> tuple:
    """Maximal runs of consecutive blocks from the same color class, as
    (start, padded_stop, first_block, stop_block) tuples.

    A color class is one independent set; ``build_plan`` only SPLITS classes
    into width-capped blocks (any subset of an independent set is one), so a
    run of same-class blocks has no intra-run couplings and the XLA sweeps
    update it in ONE matmul + Bernoulli step: at the 5640-spin Pegasus
    config this turns 47 sequential 128-wide color steps into 7 class-wide
    ones — 6.7× fewer full-spin-state reads per sweep (the dominant HBM
    term: 47·C·n_pad vs the coupling's n_pad²) and, in the graph-sharded
    sweep, 6.7× fewer per-color psums over the mesh.  The block-level
    structure stays authoritative for the Pallas kernels (VMEM-bounded
    scratch) and the block-sparse chunk packing.

    Plans without ``block_class`` (hand-built in tests) degrade to one span
    per block — the exact pre-span iteration order and RNG stream.
    """
    cached = _class_spans_cache.get(plan)
    if cached is not None:
        return cached
    bc = plan.block_class
    if bc is None:
        spans = tuple(
            (s, e, i, i + 1) for i, (s, _v, e) in enumerate(plan.blocks)
        )
    else:
        spans = []
        i, nb = 0, len(plan.blocks)
        while i < nb:
            j = i
            while j + 1 < nb and bc[j + 1] == bc[i]:
                j += 1
            spans.append((plan.blocks[i][0], plan.blocks[j][2], i, j + 1))
            i = j + 1
        spans = tuple(spans)
    _class_spans_cache[plan] = spans
    return spans


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _bfs_order(graph: GRBMGraph) -> np.ndarray:
    """Deterministic BFS rank of every node (component-by-component from the
    lowest-index unvisited node, neighbors visited in ascending index order).

    Used to order color-class members so that graph-adjacent nodes sit at
    nearby padded positions: the neighbors of a contiguous run of same-color
    spins then land in FEW 128-row chunks of each other color block, which
    is what makes the coupling matrix block-SPARSE (ops/block_sparse.py) —
    measured on the ideal Pegasus P16 latent (5640 spins), BFS ordering cuts
    occupied 128×128 coupling tiles from 49% to 26% versus index order."""
    n = graph.n
    # CSR adjacency with sorted neighbor lists (both edge directions)
    src = np.concatenate([graph.edge_i, graph.edge_j])
    dst = np.concatenate([graph.edge_j, graph.edge_i])
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    starts = np.searchsorted(src, np.arange(n + 1))
    rank = np.full(n, -1, dtype=np.int32)
    nxt = 0
    queue: list[int] = []
    for root in range(n):
        if rank[root] >= 0:
            continue
        rank[root] = nxt
        nxt += 1
        queue.append(root)
        head = 0
        while head < len(queue):
            v = queue[head]
            head += 1
            for u in dst[starts[v] : starts[v + 1]]:
                if rank[u] < 0:
                    rank[u] = nxt
                    nxt += 1
                    queue.append(int(u))
        queue.clear()
    return rank


def build_plan(
    graph: GRBMGraph, pad_to: int = 128, max_class: Optional[int] = None
) -> GibbsPlan:
    """Color-permuted sampling plan.

    ``max_class`` caps the per-block width by splitting oversized color
    classes (any subset of an independent set is an independent set, so the
    scan stays a valid Gibbs sweep).  Greedy colorings of sparse hardware
    graphs are heavily unbalanced — the first class can hold half the nodes
    — and bounded blocks keep per-color matmul operands and the Pallas
    kernels' scratch buffers inside VMEM at any graph size.  Default: 512
    for small graphs, shrinking with n so an (n_pad × max_class) bf16
    streaming buffer stays a few MB.
    """
    if max_class is None:
        n_ = graph.n
        max_class = 512 if n_ <= 2048 else (256 if n_ <= 4096 else 128)
    cc = greedy_coloring(graph.to_networkx())
    n = graph.n
    n_colors = (max(cc.values()) + 1) if n else 0
    raw_classes = [[] for _ in range(n_colors)]
    # members ordered by BFS rank, not index: graph-adjacent nodes land at
    # nearby padded positions in EVERY color block, concentrating each
    # block's couplings into few 128-row chunks — the structure the
    # block-sparse sweeps exploit (ops/block_sparse.py, _bfs_order note)
    rank = _bfs_order(graph)
    for v in np.argsort(rank, kind="stable"):
        raw_classes[cc[int(v)]].append(int(v))
    classes = []
    block_class = []
    for ci, members in enumerate(raw_classes):
        for i in range(0, len(members), max_class):
            classes.append(members[i : i + max_class])
            block_class.append(ci)

    orig_to_perm = np.zeros(n, dtype=np.int32)
    blocks = []
    pos = 0
    for members in classes:
        start = pos
        for v in members:
            orig_to_perm[v] = pos
            pos += 1
        valid_stop = pos
        pos = _round_up(pos, pad_to) if pad_to > 1 else pos
        blocks.append((start, valid_stop, pos))
    n_pad = pos

    valid_mask = np.zeros(n_pad, dtype=bool)
    valid_mask[orig_to_perm] = True
    return GibbsPlan(
        n=n,
        n_pad=n_pad,
        blocks=tuple(blocks),
        orig_to_perm=orig_to_perm,
        perm_edge_i=orig_to_perm[graph.edge_i],
        perm_edge_j=orig_to_perm[graph.edge_j],
        valid_mask=valid_mask,
        block_class=tuple(block_class),
    )


def permuted_model(
    plan: GibbsPlan, h: jax.Array, quadratic: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Build (h_p, A_p) in padded-permuted coordinates from model params.

    Static-index scatters (edge positions are compile-time constants);
    padding rows/columns stay zero.
    """
    ei = jnp.asarray(plan.perm_edge_i)
    ej = jnp.asarray(plan.perm_edge_j)
    a = jnp.zeros((plan.n_pad, plan.n_pad), dtype=jnp.float32)
    a = a.at[ei, ej].add(quadratic)
    a = a.at[ej, ei].add(quadratic)
    hp = jnp.zeros(plan.n_pad, dtype=jnp.float32).at[jnp.asarray(plan.orig_to_perm)].set(h)
    return hp, a


def random_spins(key: jax.Array, plan: GibbsPlan, n_chains: int, dtype=jnp.float32):
    """Fresh ±1 chain state in padded coordinates: (n_chains, n_pad)."""
    return 2.0 * jax.random.bernoulli(key, 0.5, (n_chains, plan.n_pad)).astype(dtype) - 1.0


def to_original(plan: GibbsPlan, spins_p: jax.Array) -> jax.Array:
    """(…, n_pad) padded spins → (…, n) original spin order (static gather)."""
    return spins_p[..., jnp.asarray(plan.orig_to_perm)]


def gibbs_sweeps(
    key: jax.Array,
    hp: jax.Array,
    coupling_p: jax.Array,
    plan: GibbsPlan,
    spins_p: jax.Array,
    n_sweeps: int,
    beta: jax.Array | float = 1.0,
    matmul_dtype=None,
    track_delta_e: bool = False,
):
    """Run ``n_sweeps`` systematic color-scan Gibbs sweeps (padded coords).

    Args:
      hp, coupling_p: permuted fields (n_pad,) and dense symmetric coupling
        (n_pad, n_pad) from ``permuted_model``.
      spins_p: (chains, n_pad) current state in {−1, +1}.
      beta: inverse temperature, scalar or (chains,).
      track_delta_e: also return the (chains,) total energy change of the
        run.  A color class has no intra-class couplings, so the exact
        change of one block update is ΔE = fields·(s_new − s_old) with the
        ``fields`` the sweep already computed — energy tracking costs one
        elementwise pass per color, no extra matmul.  Parallel tempering
        uses this to carry ladder energies across rounds instead of
        recomputing two full (T·C, n_pad)×(n_pad, n_pad) products per
        replica-exchange round (pt_round).

    Conditional update: local field f_i = h_i + Σ_j A_ij s_j and
    p(s_i = +1 | rest) = σ(−2 β f_i) — the Boltzmann conditional of
    E(s) = h·s + ½ sᵀAs.

    Returns spins, or (spins, delta_e) when ``track_delta_e``.
    """
    from image_generation_tpu.ops.block_sparse import (
        BlockSparseCoupling,
        gibbs_sweeps_block_sparse,
    )

    if isinstance(coupling_p, BlockSparseCoupling):
        # packed occupied chunks (ops/block_sparse.py): same sweep, reading
        # only the nonzero coupling tiles — FLOPs/traffic drop ~3-4× on
        # hardware graphs
        return gibbs_sweeps_block_sparse(
            key, hp, coupling_p, plan, spins_p, n_sweeps, beta,
            matmul_dtype=matmul_dtype, track_delta_e=track_delta_e,
        )
    beta = jnp.asarray(beta, dtype=jnp.float32)
    beta_col = beta if beta.ndim == 0 else beta[:, None]
    spans = class_spans(plan)
    chains = spins_p.shape[0]
    # int8-quantized coupling (ops/quant.py): the int8 MXU path — samples
    # the quantized model exactly (int32 accumulation, f32 scale-out);
    # ``matmul_dtype`` is ignored in this mode.
    quant = isinstance(coupling_p, QuantCoupling)
    if quant:
        coupling_mm, q_scale = coupling_p.q, coupling_p.scale
    else:
        # ±1 spins and small couplings lose nothing statistically in bf16;
        # the accumulation stays f32 (MXU-native). Halves HBM traffic on
        # big graphs.
        coupling_mm = coupling_p.astype(matmul_dtype) if matmul_dtype else coupling_p
    # the scan CARRIES spins in the matmul dtype (int8 in quant mode): ±1 is
    # exact in every carried dtype, fields/probabilities stay f32, and the
    # full-state re-read each span step no longer pays a per-step cast pass
    # — at big graphs the spin re-reads, not the coupling, dominate sweep
    # HBM traffic (sweeps read the state once per SPAN, n_pad²-sized
    # couplings once per sweep).
    in_dtype = spins_p.dtype
    carry_dtype = jnp.int8 if quant else (
        jnp.dtype(matmul_dtype) if matmul_dtype else in_dtype
    )

    def sweep(carry, k_sweep):
        s, de = carry
        for ci, (start, stop, _b0, _b1) in enumerate(spans):
            width = stop - start
            k = jax.random.fold_in(k_sweep, ci)
            fields = jax.lax.dot_general(
                s,
                jax.lax.slice_in_dim(coupling_mm, start, stop, axis=1),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32 if quant else jnp.float32,
            )
            if quant:
                fields = fields.astype(jnp.float32) * q_scale
            fields = fields + jax.lax.slice_in_dim(hp, start, stop)
            p_plus = jax.nn.sigmoid(-2.0 * beta_col * fields)
            u = jax.random.uniform(k, (chains, width), dtype=fields.dtype)
            new = jnp.where(u < p_plus, 1.0, -1.0).astype(s.dtype)
            if track_delta_e:
                old = jax.lax.slice_in_dim(s, start, stop, axis=1)
                de = de + jnp.sum(
                    fields * (new - old).astype(jnp.float32), axis=-1
                )
            s = jax.lax.dynamic_update_slice_in_dim(s, new, start, axis=1)
        return (s, de), None

    de0 = jnp.zeros((chains,), jnp.float32)
    (spins_p, de), _ = jax.lax.scan(
        sweep, (spins_p.astype(carry_dtype), de0), jax.random.split(key, n_sweeps)
    )
    spins_p = spins_p.astype(in_dtype)
    return (spins_p, de) if track_delta_e else spins_p


def ising_energies(
    hp: jax.Array, coupling_p: jax.Array, spins_p: jax.Array, matmul_dtype=None
) -> jax.Array:
    """E(s) = h·s + ½ sᵀ A s in padded coordinates (padding contributes 0).

    ``matmul_dtype``: optional bf16 for the sᵀA matmul (f32 accumulation) —
    exact for ±1 spins up to coupling rounding; used by PT swap tests.

    A ``QuantCoupling`` computes the energy of the QUANTIZED model exactly:
    the ±1 × int8 product accumulates in int32 (exact), scaled out once in
    f32 (``matmul_dtype`` is ignored).
    """
    from image_generation_tpu.ops.block_sparse import (
        BlockSparseCoupling,
        ising_energies_block_sparse,
    )

    if isinstance(coupling_p, BlockSparseCoupling):
        return ising_energies_block_sparse(hp, coupling_p, spins_p)
    from image_generation_tpu.ops.block_sparse_sharded import (
        ShardedBlockSparseCoupling,
    )

    if isinstance(coupling_p, ShardedBlockSparseCoupling):
        # the per-shard packed layout only makes sense on its mesh — a
        # replicated-energy call on it is a routing bug, not a math request
        raise TypeError(
            "graph-sharded packed coupling: use "
            "ops.gibbs_graph_sharded.ising_energies_graph_sharded"
        )
    if isinstance(coupling_p, QuantCoupling):
        sa = jax.lax.dot_general(
            spins_p.astype(jnp.int8),
            coupling_p.q,
            dimension_numbers=(((spins_p.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * coupling_p.scale
    elif matmul_dtype is not None:
        sa = jax.lax.dot_general(
            spins_p.astype(matmul_dtype),
            coupling_p.astype(matmul_dtype),
            dimension_numbers=(((spins_p.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        sa = spins_p @ coupling_p
    return spins_p @ hp + 0.5 * jnp.sum(spins_p * sa, axis=-1)


# ---------------------------------------------------------------------------
# Parallel tempering
# ---------------------------------------------------------------------------

def pt_round(
    key: jax.Array,
    hp: jax.Array,
    coupling_p: jax.Array,
    plan: GibbsPlan,
    spins_p: jax.Array,
    betas: jax.Array,
    sweeps_per_round: int,
    sweeps_fn=None,
    matmul_dtype=None,
    energies_fn=None,
    energies: Optional[jax.Array] = None,
    return_energies: bool = False,
    aux=None,
    return_accept: bool = False,
):
    """One PT round: Gibbs sweeps at every temperature + replica exchange.

    Args:
      spins_p: (T, C, n_pad) — T temperatures × C chains each.
      betas: (T,) ascending inverse temperatures (betas[-1] is the target).
      energies_fn: optional (hp, coupling_p, spins) → (T, C) energies —
        graph-sharded training passes ops.gibbs_graph_sharded.
        ising_energies_graph_sharded so the swap energies ride the
        reduce_scatter layout instead of gathering the sharded coupling.
      energies: optional (T, C) ladder energies carried from the previous
        round.  When given, ``sweeps_fn`` is called with
        ``track_delta_e=True`` and the swap energies are
        ``energies + delta`` — NO full-ladder energy matmul runs at all.
        When None, energies are computed once after the sweeps (still half
        the historical cost: the odd pass reuses the even pass's energies,
        permuted by the accepted swaps — bitwise identical to recomputing,
        since a configuration's energy doesn't depend on its ladder row).
      return_energies: return ``(spins, energies)`` so callers can carry
        the ladder energies into the next round.
      aux: optional pytree of per-replica payloads with leading (T, C)
        dims; leaves are permuted by the SAME accepted swaps as the
        configurations (replica-identity labels for round-trip/flow
        diagnostics, per-replica observables, ...).  When given, the
        return is ``(spins, energies, aux)``.
      return_accept: also return the (T-1,) per-pair mean analytic swap
        acceptance E[min(1, e^{Δβ·ΔE})] of this round (each pair is active
        in exactly one of the two passes, so the vector covers every pair
        once) — the free ladder-health measurement adaptive tempering and
        observability consume.  Appended last:
        ``(spins, energies[, aux], accept)``.

    Replica exchange: adjacent pairs (t, t+1) attempt a configuration swap
    accepted with probability min(1, exp((β_t − β_{t+1})(E_t − E_{t+1}))),
    even pairs then odd pairs, each chain column independently.
    """
    t_dim, c_dim, n_pad = spins_p.shape
    k_sweep, k_even, k_odd = jax.random.split(key, 3)
    if sweeps_fn is None:
        def sweeps_fn(k, h_, c_, p_, s_, n_, beta=1.0, track_delta_e=False):
            return gibbs_sweeps(
                k, h_, c_, p_, s_, n_, beta, matmul_dtype=matmul_dtype,
                track_delta_e=track_delta_e,
            )

    if energies_fn is None:
        def energies_fn(h_, c_, s_):
            return ising_energies(h_, c_, s_, matmul_dtype)

    flat = spins_p.reshape(t_dim * c_dim, n_pad)
    beta_per_chain = jnp.repeat(betas, c_dim)
    if energies is not None:
        flat, de = sweeps_fn(
            k_sweep, hp, coupling_p, plan, flat, sweeps_per_round,
            beta_per_chain, track_delta_e=True,
        )
        e = energies + de.reshape(t_dim, c_dim)
    else:
        flat = sweeps_fn(
            k_sweep, hp, coupling_p, plan, flat, sweeps_per_round, beta_per_chain
        )
    spins_p = flat.reshape(t_dim, c_dim, n_pad)
    if energies is None:
        e = energies_fn(hp, coupling_p, spins_p)  # (T, C), once per round

    def swap_pass(s, e, aux, k, parity):
        delta = (betas[:-1] - betas[1:])[:, None] * (e[:-1] - e[1:])  # (T-1, C)
        u = jax.random.uniform(k, delta.shape)
        pair_mask = (jnp.arange(t_dim - 1) % 2 == parity)[:, None]
        accept = (jnp.log(u) < delta) & pair_mask  # (T-1, C)
        # analytic per-pair acceptance of this pass's active pairs (lower
        # variance than counting realized swaps; inactive pairs are 0)
        p_acc = (jnp.minimum(1.0, jnp.exp(delta)) * pair_mask).mean(axis=1)
        pad = jnp.zeros((1, c_dim), dtype=bool)
        swap_next = jnp.concatenate([accept, pad], axis=0)  # row t ↔ t+1
        swap_prev = jnp.concatenate([pad, accept], axis=0)  # row t ↔ t−1

        def permute(x):
            # broadcast the (T, C) swap masks over any trailing payload dims
            m_next = swap_next.reshape(swap_next.shape + (1,) * (x.ndim - 2))
            m_prev = swap_prev.reshape(swap_prev.shape + (1,) * (x.ndim - 2))
            return jnp.where(
                m_next, jnp.roll(x, -1, axis=0),
                jnp.where(m_prev, jnp.roll(x, 1, axis=0), x),
            )

        # energies (and any aux payload) travel WITH the configurations:
        # permuting by the same masks is bitwise what recomputing after the
        # swap would give
        s = permute(s)
        e = permute(e)
        if aux is not None:
            aux = jax.tree.map(permute, aux)
        return s, e, aux, p_acc

    spins_p, e, aux, acc_even = swap_pass(spins_p, e, aux, k_even, 0)
    spins_p, e, aux, acc_odd = swap_pass(spins_p, e, aux, k_odd, 1)
    acc = acc_even + acc_odd  # disjoint parity masks: every pair once
    if aux is not None:
        return (spins_p, e, aux, acc) if return_accept else (spins_p, e, aux)
    if return_accept:
        return spins_p, e, acc
    return (spins_p, e) if return_energies else spins_p


def pt_sample(
    key: jax.Array,
    hp: jax.Array,
    coupling_p: jax.Array,
    plan: GibbsPlan,
    n_chains: int,
    betas: jax.Array,
    n_rounds: int,
    sweeps_per_round: int,
    init_spins: Optional[jax.Array] = None,
    matmul_dtype=None,
) -> Tuple[jax.Array, jax.Array]:
    """Full parallel-tempering run from (optionally persistent) chain state.

    Returns (target_spins, ladder): the (C, n_pad) samples at the target
    temperature betas[-1], and the full (T, C, n_pad) ladder state for
    persistence across calls (the working version of the reference's dead
    persistent-sample deque, src/utils/persistent_qpu_sampler.py:61-63).
    """
    t_dim = betas.shape[0]
    k_init, key = jax.random.split(key)
    if init_spins is None:
        init_spins = random_spins(k_init, plan, t_dim * n_chains).reshape(
            t_dim, n_chains, plan.n_pad
        )

    # ladder energies are computed ONCE here and carried through every round
    # (the sweeps track ΔE, the swaps permute e) — no per-round energy matmul
    e0 = ising_energies(hp, coupling_p, init_spins, matmul_dtype)

    def round_fn(carry, k):
        s, e = carry
        return pt_round(
            k, hp, coupling_p, plan, s, betas, sweeps_per_round,
            matmul_dtype=matmul_dtype, energies=e, return_energies=True,
        ), None

    (spins_p, _), _ = jax.lax.scan(
        round_fn, (init_spins, e0), jax.random.split(key, n_rounds)
    )
    return spins_p[-1], spins_p
