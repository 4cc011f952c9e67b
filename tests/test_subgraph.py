"""Tests for greedy subgraph selection and logical relabeling."""

import networkx as nx

from image_generation_tpu.utils.subgraph import (
    get_graph_mapping,
    greedy_get_subgraph,
    select_latent_graph,
)
from image_generation_tpu.utils.topology import pegasus_graph, zephyr_graph


def test_deterministic_under_seed():
    g = zephyr_graph(4)
    a = greedy_get_subgraph(64, 1234, g)
    b = greedy_get_subgraph(64, 1234, g)
    assert set(a.nodes()) == set(b.nodes())
    c = greedy_get_subgraph(64, 999, g)
    assert set(a.nodes()) != set(c.nodes())  # overwhelmingly likely


def test_subgraph_is_connected_and_dense():
    g = pegasus_graph(6)
    sub = greedy_get_subgraph(128, 775321899904, g)
    assert sub.number_of_nodes() == 128
    assert nx.is_connected(sub)
    # greedy growth should find near-max-density regions: average degree
    # well above a random induced subgraph's.
    avg_deg = 2 * sub.number_of_edges() / sub.number_of_nodes()
    assert avg_deg > 6.0


def test_reference_scale_edge_density():
    """256-node subgraphs should land near the shipped checkpoints' density.

    Reference checkpoints: 256 latents with 1636/1635 edges (Pegasus) and
    2059 edges (Zephyr) (models/*/grbm.pth, SURVEY.md §6).
    """
    zg = zephyr_graph(15)
    sub, _ = select_latent_graph(zg, 256, 775321899904)
    # ideal graph (no dead qubits) + greedy densest-region growth lands above
    # the defective-hardware checkpoint's 2059; interior degree 20 caps the
    # density at 256·20/2 = 2560
    assert 2000 <= sub.number_of_edges() <= 2560
    pg = pegasus_graph(16)
    sub_p, _ = select_latent_graph(pg, 256, 775321899904)
    assert 1300 <= sub_p.number_of_edges() <= 1900


def test_mapping_relabels_to_range():
    g = zephyr_graph(3)
    sub = greedy_get_subgraph(32, 7, g)
    mapped, mapping = get_graph_mapping(sub)
    assert set(mapped.nodes()) == set(range(32))
    assert set(mapping.keys()) == set(sub.nodes())
    assert sorted(mapping.values()) == list(range(32))
    # edges preserved under the relabeling
    assert mapped.number_of_edges() == sub.number_of_edges()
