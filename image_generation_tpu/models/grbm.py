"""Graph-Restricted Boltzmann Machine: a fully-visible Ising model pytree.

TPU-native replacement for ``dwave.plugins.torch.models.
GraphRestrictedBoltzmannMachine`` as consumed by the reference
(construction: src/model_wrapper.py:202-206; energy forward:
src/losses.py:61; negative-phase sampling: src/model_wrapper.py:308-316 and
src/utils/persistent_qpu_sampler.py:71-78).  Observable contract reproduced:

  * parameters ``linear`` (n,) and ``quadratic`` (E,) over an arbitrary
    coupling graph given as edge index lists (the checkpoint tensor layout
    ``_linear/_quadratic/_edge_idx_i/_edge_idx_j/_visible_idx`` is honored by
    ``io.checkpoint``);
  * ``energy(spins) = Σ_i h_i s_i + Σ_(ij) J_ij s_i s_j`` per sample;
  * sampling scales parameters by a prefactor and clips them into the
    hardware h/J ranges before drawing from the (approximately) Boltzmann
    distribution of the *scaled* model — exactly what the annealer call does
    with ``auto_scale=False`` (src/utils/common.py:129-138).

Design: parameters live in a tiny ``GRBMParams`` pytree (differentiable);
the immutable graph structure lives in ``GRBMGraph`` (host numpy, hashable
by identity) so jitted functions close over it statically.  The NLL gradient
is computed in closed form (moment matching) rather than by autodiff — it is
exact for this model family and avoids differentiating through the sampler.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = ["GRBMParams", "GRBMGraph", "energy", "scaled_ising", "nll_grads", "nll_value"]


@struct.dataclass
class GRBMParams:
    """Differentiable GRBM parameters (the checkpoint's _linear/_quadratic)."""

    linear: jax.Array  # (n,) float32 — per-spin field h_i
    quadratic: jax.Array  # (E,) float32 — per-edge coupling J_ij

    @property
    def n(self) -> int:
        return self.linear.shape[0]

    @property
    def n_edges(self) -> int:
        return self.quadratic.shape[0]


@dataclass(frozen=True)
class GRBMGraph:
    """Immutable coupling structure (the checkpoint's _edge_idx_i/_edge_idx_j).

    ``edge_i[k] < edge_j[k]`` is not required but edges must be unique and
    non-self.  ``visible_idx`` is carried for checkpoint parity (always
    0..n-1 in the reference's fully-visible models).
    """

    n: int
    edge_i: np.ndarray  # (E,) int32
    edge_j: np.ndarray  # (E,) int32

    def __post_init__(self):
        object.__setattr__(self, "edge_i", np.asarray(self.edge_i, np.int32))
        object.__setattr__(self, "edge_j", np.asarray(self.edge_j, np.int32))
        if (self.edge_i == self.edge_j).any():
            raise ValueError("self-loops are not allowed")

    def __hash__(self):  # identity hash: safe as a static jit argument
        return id(self)

    def __eq__(self, other):
        return self is other

    @property
    def n_edges(self) -> int:
        return int(self.edge_i.shape[0])

    @property
    def visible_idx(self) -> np.ndarray:
        return np.arange(self.n, dtype=np.int64)

    @classmethod
    def from_networkx(cls, graph) -> "GRBMGraph":
        """Build from a logical (0..n-1 labeled) networkx graph.

        Edge order follows ``graph.edges()`` iteration with each edge stored
        as (min, max) — matching how the reference constructs the GRBM from
        the selected subgraph (src/model_wrapper.py:202-206).
        """
        n = graph.number_of_nodes()
        if n and set(graph.nodes()) != set(range(n)):
            raise ValueError("graph must be relabeled to logical ints 0..n-1")
        ei, ej = [], []
        for u, v in graph.edges():
            a, b = (u, v) if u < v else (v, u)
            ei.append(a)
            ej.append(b)
        return cls(n=n, edge_i=np.asarray(ei, np.int32), edge_j=np.asarray(ej, np.int32))

    def to_networkx(self):
        import networkx as nx

        g = nx.Graph()
        g.add_nodes_from(range(self.n))
        g.add_edges_from(zip(self.edge_i.tolist(), self.edge_j.tolist()))
        return g

    def coupling_matrix(self, quadratic) -> jax.Array:
        """Dense symmetric (n, n) coupling matrix with zero diagonal.

        The Gibbs sampler's local fields are ``s @ A + h``; building A as one
        dense matrix keeps the per-sweep inner loop on the MXU.
        """
        a = jnp.zeros((self.n, self.n), dtype=jnp.float32)
        a = a.at[self.edge_i, self.edge_j].add(quadratic)
        a = a.at[self.edge_j, self.edge_i].add(quadratic)
        return a

    def init_params(self, key: Optional[jax.Array] = None, scale: float = 0.01) -> GRBMParams:
        """Small random init (the torch plugin initializes near zero)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        return GRBMParams(
            linear=scale * jax.random.normal(k1, (self.n,), jnp.float32),
            quadratic=scale * jax.random.normal(k2, (self.n_edges,), jnp.float32),
        )


def energy(params: GRBMParams, graph: GRBMGraph, spins: jax.Array) -> jax.Array:
    """Per-sample Ising energy E(s) = Σ h·s + Σ J·s_i·s_j.

    ``spins``: (..., n) in {-1, +1}.  Returns (...,).  Matches the
    reference's ``grbm(spins)`` forward (src/losses.py:61).
    """
    ei = jnp.asarray(graph.edge_i)
    ej = jnp.asarray(graph.edge_j)
    lin = spins @ params.linear
    quad = (spins[..., ei] * spins[..., ej]) @ params.quadratic
    return lin + quad


def scaled_ising(
    params: GRBMParams,
    prefactor: float,
    linear_range: Tuple[float, float],
    quadratic_range: Tuple[float, float],
) -> Tuple[jax.Array, jax.Array]:
    """The Ising problem actually submitted to the sampler.

    The reference's ``grbm.sample`` multiplies parameters by ``prefactor``
    and clips into the hardware ``h_range``/``j_range`` before sampling with
    ``auto_scale=False`` (call sites src/model_wrapper.py:308-316; ranges
    from src/utils/common.py:129).  Returns (h, J) for the scaled model.
    """
    h = jnp.clip(prefactor * params.linear, linear_range[0], linear_range[1])
    j = jnp.clip(prefactor * params.quadratic, quadratic_range[0], quadratic_range[1])
    return h, j


def suff_stats(graph: GRBMGraph, spins: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Mean sufficient statistics (⟨s_i⟩, ⟨s_i s_j⟩) over the batch axis.

    ``spins``: (B, n) → ((n,), (E,)).
    """
    ei = jnp.asarray(graph.edge_i)
    ej = jnp.asarray(graph.edge_j)
    m1 = jnp.mean(spins, axis=0)
    m2 = jnp.mean(spins[:, ei] * spins[:, ej], axis=0)
    return m1, m2


def nll_value(
    params: GRBMParams,
    graph: GRBMGraph,
    data_spins: jax.Array,
    model_spins: jax.Array,
) -> jax.Array:
    """The reference's quasi-NLL objective value.

    ``mean(E(data)) − mean(E(model_samples))`` (src/losses.py:61) — its
    gradient wrt (h, J) equals the NLL gradient when ``model_spins`` are
    Boltzmann samples of the model.
    """
    return jnp.mean(energy(params, graph, data_spins)) - jnp.mean(
        energy(params, graph, model_spins)
    )


def nll_grads(
    graph: GRBMGraph, data_spins: jax.Array, model_spins: jax.Array
) -> GRBMParams:
    """Closed-form gradient of the quasi-NLL wrt GRBM parameters.

    d/dh_i  = ⟨s_i⟩_data − ⟨s_i⟩_model,
    d/dJ_ij = ⟨s_i s_j⟩_data − ⟨s_i s_j⟩_model.

    Identical to autodiff through ``nll_value`` (verified in tests) but free.
    """
    d1, d2 = suff_stats(graph, data_spins)
    m1, m2 = suff_stats(graph, model_spins)
    return GRBMParams(linear=d1 - m1, quadratic=d2 - m2)
