"""Event-sourced correction engine tests (C8 headless parity)."""

import numpy as np

from arterynetwork_tpu.graphs.editing import CorrectionSession
from arterynetwork_tpu.graphs.segments import segments_to_graph, validate_segment
from arterynetwork_tpu.io.artifacts import ArtifactStore


def _x_segments():
    """Four branches meeting at one junction (an X)."""
    j = (10, 10, 10)
    segs = []
    for d in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0)):
        seg = [j] + [(10 + d[0] * i, 10 + d[1] * i, 10 + d[2] * i)
                     for i in range(1, 7)]
        segs.append(seg)
    return segs


def test_remove_with_auto_merge():
    """Removing one of three branches at a junction merges the other two
    into a single simple branch (mergeSegments semantics)."""
    segs = _x_segments()[:3]  # junction of degree 3
    s = CorrectionSession(segs)
    s.remove_segment(0)
    remaining = s.segment_list()
    assert len(remaining) == 1
    G = s.graph()
    assert validate_segment(G, remaining[0])
    # merged branch spans both tips
    tips = {remaining[0][0], remaining[0][-1]}
    assert tips == {(4, 10, 10), (10, 16, 10)} or tips == {(10, 16, 10), (4, 10, 10)} or \
        tips == {(10, 4, 10), (16, 10, 10)} or len(tips) == 2


def test_undo_is_exact_inverse():
    segs = _x_segments()
    s = CorrectionSession(segs)
    before = {i: list(seg) for i, seg in s.segments.items()}
    s.remove_segment(1)
    s.cut(2, (10, 13, 10))
    assert s.segments != before
    s.undo()
    s.undo()
    assert {i: list(seg) for i, seg in s.segments.items()} == before
    assert s.events == []


def test_replay_reproduces_state(tmp_path):
    segs = _x_segments()
    s1 = CorrectionSession(segs)
    s1.remove_segment(0)
    s1.cut(2, (10, 13, 10))
    s1.reconnect((4, 10, 10), (10, 4, 10))
    events = [dict(e) for e in s1.events]

    s2 = CorrectionSession(segs)
    s2.replay(events)
    assert {i: list(v) for i, v in s2.segments.items()} == \
        {i: list(v) for i, v in s1.segments.items()}


def test_reconnect_creates_connected_chain():
    segs = _x_segments()
    s = CorrectionSession(segs)
    ev = s.reconnect((16, 10, 10), (10, 16, 10),
                     context_a=[(14, 10, 10), (15, 10, 10)],
                     context_b=[(10, 15, 10), (10, 14, 10)])
    chain = list(ev["added"].values())[0]
    assert chain[0] == (16, 10, 10) and chain[-1] == (10, 16, 10)
    arr = np.asarray(chain)
    steps = np.abs(arr[1:] - arr[:-1]).max(axis=1)
    assert (steps == 1).all(), "bridge must be 26-connected"
    # a cycle now exists (junction -> tipA -> bridge -> tipB -> junction)
    assert len(s.check_cycles()) >= 1


def test_grow_extends_terminal():
    segs = _x_segments()
    s = CorrectionSession(segs)
    tip = segs[0][-1]
    ext = [tip, (17, 10, 10), (18, 10, 10)]
    s.grow(0, ext)
    new = [seg for seg in s.segment_list() if (18, 10, 10) in seg]
    assert len(new) == 1 and len(new[0]) == len(segs[0]) + 2


def _twin_arc_segments():
    """Trunk 0..30 on x with a short redundant twin arc spanning the
    (10,0,0)-(14,0,0) stretch — the same-branch thinning-loop artifact."""
    trunk = [(i, 0, 0) for i in range(31)]
    twin = [(10, 0, 0), (11, 1, 0), (12, 1, 0), (13, 1, 0), (14, 0, 0)]
    return [trunk[:11], trunk[10:15], trunk[14:], twin]


def test_audit_junction_bridges_cuts_twin_as_replayable_events():
    """The automated junction audit runs THROUGH the editing engine:
    the redundant twin arc is removed as ordinary remove events that
    replay and undo exactly (the reference's manual remove+merge
    workflow, driven automatically)."""
    from arterynetwork_tpu.graphs.editing import audit_junction_bridges

    segs = _twin_arc_segments()
    dt = np.ones((31, 8, 4), np.float32)
    for v in segs[3]:
        dt[v] = 0.5                      # twin arc is weaker

    s = CorrectionSession(segs)
    before = {i: list(seg) for i, seg in s.segments.items()}
    events = audit_junction_bridges(s, distance_transform=dt)
    assert len(events) >= 1
    remaining = s.segment_list()
    flat = {v for seg in remaining for v in seg}
    assert (11, 1, 0) not in flat        # twin gone
    assert len(remaining) == 1           # junctions merged through
    assert set(remaining[0]) == {(i, 0, 0) for i in range(31)}

    # events are ordinary session events: replay reproduces, undo inverts
    s2 = CorrectionSession(segs)
    s2.replay([dict(e) for e in s.events])
    assert {i: list(v) for i, v in s2.segments.items()} == \
        {i: list(v) for i, v in s.segments.items()}
    for _ in range(len(s.events)):
        s.undo()
    assert {i: list(seg) for i, seg in s.segments.items()} == before


def test_audit_junction_bridges_keeps_uncovered_real_branch():
    """A short junction-junction arc on a cycle survives when no other
    segment covers its geometry (a real collateral, not an artifact)."""
    from arterynetwork_tpu.graphs.editing import audit_junction_bridges

    bottom = [(i, 0, 0) for i in range(11)]
    right = [(10, j, 0) for j in range(11)]
    top = [(i, 10, 0) for i in range(10, -1, -1)]
    left = [(0, j, 0) for j in range(10, -1, -1)]
    stub_a = [(0, 0, 0), (0, 0, 1), (0, 0, 2), (0, 0, 3)]
    stub_b = [(10, 0, 0), (10, 0, 1), (10, 0, 2), (10, 0, 3)]
    segs = [bottom, right, top, left, stub_a, stub_b]

    s = CorrectionSession(segs)
    events = audit_junction_bridges(s)
    assert events == []
    assert len(s.segment_list()) == len(segs)


def test_save_contract(tmp_path):
    store = ArtifactStore(str(tmp_path))
    segs = _x_segments()
    s = CorrectionSession(segs)
    s.remove_segment(3)
    cleaned = s.save(store)
    assert store.exists("eventList.pkl")
    assert store.exists("segmentListCleaned.npz")
    assert store.exists("graphRepresentationCleaned.graphml")
    # event list replays on a fresh session (resume-from-artifacts)
    events = store.load_pickle("eventList.pkl")
    s2 = CorrectionSession(segs)
    s2.replay(events)
    assert {tuple(map(tuple, v)) for v in s2.segment_list()} == \
        {tuple(map(tuple, v)) for v in s.segment_list()}


def test_replay_advances_index_allocator():
    """Edits made after replaying a persisted event list must not reuse
    the replayed events' 'added' indices (reusing one silently clobbers
    the replayed segment)."""
    from arterynetwork_tpu.graphs.editing import CorrectionSession

    def structure(y):
        trunk = [(i, y, 0) for i in range(31)]
        twin = [(10, y, 0), (11, y + 1, 0), (12, y + 1, 0),
                (13, y + 1, 0), (14, y, 0)]
        return [trunk[:11], trunk[10:15], trunk[14:], twin]

    segs = structure(0) + structure(10)
    s1 = CorrectionSession(segs)
    s1.remove_segment(3)                 # first structure's twin

    # persist + reload + replay, then do the second structure's edit
    s2 = CorrectionSession(segs)
    s2.replay([dict(e) for e in s1.events])
    s2.remove_segment(7)                 # second structure's twin
    flat = {v for seg in s2.segment_list() for v in seg}
    # both merged trunks must be fully present (index reuse used to
    # clobber the replayed one)
    assert {(i, 0, 0) for i in range(31)} <= flat
    assert {(i, 10, 0) for i in range(31)} <= flat
    assert len(s2.segment_list()) == 2


def test_report_cycle_info(capsys):
    """A square loop reports one cycle; an X reports none
    (reportCycleInfo, manualCorrectionGUIDetail.py:246-253)."""
    loop = [[(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0), (0, 0, 0)]]
    s = CorrectionSession(loop)
    assert s.report_cycle_info() == 1
    assert "1 cycles remaining" in capsys.readouterr().out
    assert CorrectionSession(_x_segments()).report_cycle_info() == 0
