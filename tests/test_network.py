"""Graph-utility and topology tests.

Uses the same ~30-node fixture network as the reference's graph unit tests
(``troute-network/troute/test_nhd_network.py``) so connection extraction and
reversal can be asserted against the identical expected dicts.
"""

import numpy as np
import pytest

from troute_tpu.network import graph
from troute_tpu.network.topology import (
    NODE_MC, NODE_RESERVOIR, build_topology, from_connections)

# fixture rows: [id, dx, downstream, waterbody] (reference test fixture data)
NETWORK_ROWS = [
    [0, 456, -999, 0], [1, 178, 4, 0], [2, 394, 0, 0], [3, 301, 2, 0],
    [4, 798, 0, 403], [5, 679, 4, 403], [6, 523, 0, 0], [7, 815, 2, 0],
    [8, 841, -999, 0], [9, 514, 8, 0], [10, 458, 9, 0], [11, 832, 10, 0],
    [12, 543, 11, 0], [13, 240, 12, 0], [14, 548, 13, 0], [15, 920, 14, 0],
    [16, 920, 15, 401], [17, 514, 16, 401], [18, 458, 17, 0],
    [180, 458, 17, 0], [181, 458, 180, 0], [19, 832, 18, 0],
    [20, 543, 19, 0], [21, 240, 16, 401], [22, 548, 21, 0],
    [23, 920, 22, 0], [24, 240, 23, 0], [25, 548, 12, 0],
    [26, 920, 25, 402], [27, 920, 26, 402], [28, 920, 27, 0],
    [2800, 920, 2700, 0],
]

EXPECTED_CONNECTIONS = {
    0: [], 1: [4], 2: [0], 3: [2], 4: [0], 5: [4], 6: [0], 7: [2], 8: [],
    9: [8], 10: [9], 11: [10], 12: [11], 13: [12], 14: [13], 15: [14],
    16: [15], 17: [16], 18: [17], 180: [17], 181: [180], 19: [18],
    20: [19], 21: [16], 22: [21], 23: [22], 24: [23], 25: [12], 26: [25],
    27: [26], 28: [27], 2800: [],
}

EXPECTED_RCONN = {
    0: [2, 4, 6], 1: [], 4: [1, 5], 2: [3, 7], 3: [], 5: [], 6: [], 7: [],
    8: [9], 9: [10], 10: [11], 11: [12], 12: [13, 25], 13: [14], 14: [15],
    15: [16], 16: [17, 21], 17: [18, 180], 18: [19], 180: [181], 181: [],
    19: [20], 20: [], 21: [22], 22: [23], 23: [24], 24: [], 25: [26],
    26: [27], 27: [28], 28: [], 2800: [],
}

WBODY_CONN = {4: 403, 5: 403, 16: 401, 17: 401, 21: 401, 26: 402, 27: 402}


def _connections():
    ids = [r[0] for r in NETWORK_ROWS]
    down = [r[2] for r in NETWORK_ROWS]
    # terminal codes: the explicit one plus off-domain pointers (2700)
    terminals = {-999} | ({d for d in down} - set(ids))
    return graph.extract_connections(ids, down, terminals)


def test_extract_connections():
    assert _connections() == EXPECTED_CONNECTIONS


def test_reverse_network():
    rconn = graph.reverse_network(EXPECTED_CONNECTIONS)
    assert {k: sorted(v) for k, v in rconn.items()} == \
        {k: sorted(v) for k, v in EXPECTED_RCONN.items()}
    back = graph.reverse_network(rconn)
    assert {k: sorted(v) for k, v in back.items()} == \
        {k: sorted(v) for k, v in EXPECTED_CONNECTIONS.items()}


def test_headwaters_tailwaters():
    conn = _connections()
    assert graph.headwaters(conn) == {1, 3, 5, 6, 7, 20, 24, 28, 181, 2800}
    assert graph.tailwaters(conn) == {0, 8, 2800}


def test_reachable_network_disjoint():
    rconn = graph.reverse_network(_connections())
    nets = graph.reachable_network(rconn)
    assert set(nets.keys()) == {0, 8, 2800}
    sizes = {tw: len(n) for tw, n in nets.items()}
    assert sizes[2800] == 1
    assert sum(sizes.values()) == len(NETWORK_ROWS)


def test_reach_decomposition_invariants():
    conn = _connections()
    rconn = graph.reverse_network(conn)
    reaches = graph.dfs_reach_decomposition(rconn)
    # every node exactly once
    flat = [n for r in reaches for n in r]
    assert sorted(flat) == sorted(conn.keys())
    # within a reach: consecutive nodes are linked, interior nodes unbranched
    for r in reaches:
        for a, b in zip(r, r[1:]):
            assert conn[a] == [b]
            assert len(rconn[b]) == 1
    # topological order: every reach after its upstream reaches
    seen = set()
    for r in reaches:
        ups = rconn[r[0]]
        assert all(u in seen for u in ups)
        seen.update(r)


def test_reach_decomposition_breaks_at_waterbody():
    conn = _connections()
    rconn = graph.reverse_network(conn)
    wb_nodes = set(WBODY_CONN)
    pred = graph.break_at_junction(rconn, waterbody_nodes=wb_nodes)
    reaches = graph.dfs_reach_decomposition(rconn, keep_going=pred)
    for r in reaches:
        inside = [n in wb_nodes for n in r]
        assert all(inside) or not any(inside), \
            f"reach {r} mixes waterbody and stream nodes"


def test_replace_waterbodies():
    conn = _connections()
    new_conn, outlets = graph.replace_waterbodies(conn, WBODY_CONN)
    assert 401 in new_conn and 402 in new_conn and 403 in new_conn
    assert set(new_conn[401]) == {15}
    assert set(new_conn[402]) == {25}
    assert set(new_conn[403]) == {0}
    # upstream fringes now point at lake nodes
    assert new_conn[18] == [401] or 401 in new_conn[18]
    assert new_conn[22] == [401]
    assert new_conn[28] == [402]
    assert new_conn[1] == [403]
    # no waterbody member nodes remain
    for n in WBODY_CONN:
        assert n not in new_conn
    assert outlets[401] == 16
    assert outlets[402] == 26
    assert outlets[403] == 4


def test_kahn_toposort():
    order = graph.kahn_toposort(_connections())
    pos = {n: i for i, n in enumerate(order)}
    for src, dsts in _connections().items():
        for d in dsts:
            assert pos[src] < pos[d]


def test_kahn_detects_cycle():
    with pytest.raises(ValueError):
        graph.kahn_toposort({1: [2], 2: [1]})


def test_topology_build_and_levels():
    conn = _connections()
    topo = from_connections(conn)
    topo.validate()
    assert topo.n_nodes == len(conn)
    # headwaters at level 0
    hw = graph.headwaters(conn)
    for h in hw:
        assert topo.level[topo.index_of[h]] == 0
    # level = longest path: node 8 <- 9 <- ... <- 16 <- 17 <- 18 <- 19 <- 20
    # chain from 20: 20->19->18->17->16->15->14->13->12->11->10->9->8
    assert topo.level[topo.index_of[8]] == 12
    # node 0: longest path via 3->2->0 = 2
    assert topo.level[topo.index_of[0]] == 2


def test_topology_upstream_gather():
    topo = from_connections(_connections())
    i0 = topo.index_of[0]
    ups = set(topo.upstream[i0][topo.upstream[i0] >= 0])
    assert ups == {topo.index_of[2], topo.index_of[4], topo.index_of[6]}
    assert topo.n_upstream[i0] == 3
    i181 = topo.index_of[181]
    assert topo.n_upstream[i181] == 0


def test_topology_with_collapsed_waterbodies():
    conn = _connections()
    new_conn, _ = graph.replace_waterbodies(conn, WBODY_CONN)
    topo = from_connections(new_conn, reservoir_ids=[401, 402, 403])
    topo.validate()
    assert topo.node_type[topo.index_of[401]] == NODE_RESERVOIR
    assert topo.node_type[topo.index_of[15]] == NODE_MC
    assert topo.reservoir_rows.size == 3
    assert topo.res_slot[topo.index_of[402]] >= 0
    assert topo.res_slot[topo.index_of[15]] == -1


def test_level_nodes_padding():
    topo = from_connections(_connections())
    ln = topo.level_nodes
    assert ln.shape[0] == topo.n_levels
    covered = ln[ln >= 0]
    assert sorted(covered) == list(range(topo.n_nodes))
    for lvl in range(topo.n_levels):
        rows = ln[lvl][ln[lvl] >= 0]
        assert np.all(topo.level[rows] == lvl)


def test_build_topology_cycle_raises():
    with pytest.raises(ValueError):
        build_topology([1, 2], [2, 1], terminal_codes=(0,))


def test_build_topology_drops_cycles():
    """on_cycle='drop' removes circular subnetworks like the reference
    (its circular fixtures never reach a tailwater and are filtered)."""
    # clean chain 1->2->3 plus two cycles (reference network_circulars idea)
    ids = [1, 2, 3, 50, 51, 60, 61, 62]
    down = [2, 3, 0, 51, 50, 61, 62, 60]
    topo = build_topology(ids, down, terminal_codes=(0,), on_cycle="drop")
    assert sorted(topo.ids.tolist()) == [1, 2, 3]
    topo.validate()
    with pytest.raises(ValueError):
        build_topology(ids, down, terminal_codes=(0,))
