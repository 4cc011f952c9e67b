"""Tests for greedy coloring and static class packing."""

import numpy as np

from image_generation_tpu.utils.coloring import color_classes, greedy_coloring
from image_generation_tpu.utils.subgraph import select_latent_graph
from image_generation_tpu.utils.topology import zephyr_graph


def test_coloring_proper_on_latent_graph():
    g, _ = select_latent_graph(zephyr_graph(4), 128, 42)
    colors = greedy_coloring(g)
    for u, v in g.edges():
        assert colors[u] != colors[v]
    # sparse hardware graphs color with far fewer colors than max degree + 1
    assert max(colors.values()) + 1 <= 21


def test_color_classes_packing():
    g, _ = select_latent_graph(zephyr_graph(4), 100, 0)
    cc = color_classes(g, pad_to=128)
    assert cc.class_size % 128 == 0
    assert cc.indices.shape == (cc.n_colors, cc.class_size)
    # each node appears exactly once across classes
    real = cc.indices[cc.valid]
    assert sorted(real.tolist()) == list(range(100))
    # padding points one past the end
    assert (cc.indices[~cc.valid] == 100).all()
    # color_of is consistent with class membership
    for c in range(cc.n_colors):
        for v in cc.indices[c][cc.valid[c]]:
            assert cc.color_of[v] == c
