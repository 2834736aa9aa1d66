"""Diagnostics: loss graph ring buffer + hash level stats."""

import numpy as np
import jax

from rnb_neus2_tpu.config import HashGridConfig
from rnb_neus2_tpu.ops import hash_encoding as he
from rnb_neus2_tpu.utils.diagnostics import (LossGraph, format_level_stats,
                                             gather_level_stats)


def test_loss_graph_ring():
    g = LossGraph(capacity=8)
    for i in range(20):
        g.update(float(i))
    v = g.values()
    np.testing.assert_array_equal(v, np.arange(12, 20, dtype=np.float32))


def test_level_stats():
    cfg = HashGridConfig(n_levels=5, top_resolution=128)
    static = he.HashGridStatic(cfg)
    table = he.init_table(jax.random.PRNGKey(0), cfg)
    stats = gather_level_stats(table, static)
    assert len(stats) == 5
    assert stats[0].resolution == 16 and not stats[0].hashed
    assert sum(s.n_params for s in stats) == static.n_entries * 0 + sum(
        int(t) for t in static.table_sizes)
    assert all(abs(s.mean) < 1e-4 for s in stats)  # U(−1e−4,1e−4) init
    txt = format_level_stats(stats)
    assert "dense" in txt and str(stats[0].resolution) in txt
