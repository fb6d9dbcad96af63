"""Struct-of-arrays vascular network container.

The reference keeps the reduced network in three parallel dict structures
(``G``/``nodeInfoDict``/``edgeInfoDict``, fluidSimulation.py:30-75) with
integer node/edge indices.  Here the same information lives in flat numpy
arrays so the compute path can hand static-shaped tensors to XLA.

Conventions (identical to the reference):
  * edge ``e`` connects ``heads[e] -> tails[e]`` where the head is the
    endpoint with the smaller depth (fluidSimulation.py:929-932);
  * flow in an edge is positive head->tail;
  * node 0 is the root unless stated otherwise; entry nodes carry
    ``isEntryNode`` (fluidSimulation.py:90);
  * ``radius``/``length`` are stored in voxels and converted to meters with
    ``spacing`` at use sites (fluidSimulation.py:67, 323-343).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from ..constants import DEFAULT_SPACING


@dataclasses.dataclass
class FlowNetwork:
    """An attributed vessel graph reduced to one edge per simple branch."""

    heads: np.ndarray            # int32[E], lower-depth endpoint
    tails: np.ndarray            # int32[E]
    node_depth: np.ndarray       # int32[N]
    radius: np.ndarray           # float64[E], mean radius in voxels
    length: np.ndarray           # float64[E], path length in voxels
    c: np.ndarray                # float64[E], Hazen-Williams c
    k: np.ndarray                # float64[E], Hazen-Williams exponent
    entry_nodes: np.ndarray      # int32[n_entry], nodes with fixed inlet pressure
    spacing: float = DEFAULT_SPACING

    # Simulation state (same role as simulationData in the reference).
    node_pressure: Optional[np.ndarray] = None   # float64[N], Pa
    edge_velocity: Optional[np.ndarray] = None   # float64[E], m/s
    edge_flow: Optional[np.ndarray] = None       # float64[E], m^3/s

    # Optional metadata preserved from upstream pipeline stages.
    node_coord: Optional[np.ndarray] = None      # int32[N,3] voxel coordinates
    edge_segment_index: Optional[np.ndarray] = None  # int32[E] into segmentList

    # Friction law behind (c, k): "hw" = Hazen-Williams from the ADAN
    # model (the reference's only finished branch), "dw" = laminar
    # Darcy-Weisbach (the reference's empty method='DW' slot, finished
    # here — flow/network_setup.apply_darcy_weisbach).  Radius updates
    # re-derive c/k through set_network_ck, which dispatches on this tag
    # so a DW network stays DW through studies and perturbations.
    physics: str = "hw"

    # ------------------------------------------------------------------
    # Derived quantities
    # ------------------------------------------------------------------
    @property
    def num_nodes(self) -> int:
        return int(self.node_depth.shape[0])

    @property
    def num_edges(self) -> int:
        return int(self.heads.shape[0])

    @property
    def degree(self) -> np.ndarray:
        deg = np.zeros(self.num_nodes, dtype=np.int32)
        np.add.at(deg, self.heads, 1)
        np.add.at(deg, self.tails, 1)
        return deg

    @property
    def edge_depth(self) -> np.ndarray:
        """Edge depth = min endpoint depth (fluidSimulation.py:260-262)."""
        return np.minimum(self.node_depth[self.heads], self.node_depth[self.tails])

    def is_entry_node(self) -> np.ndarray:
        mask = np.zeros(self.num_nodes, dtype=bool)
        mask[self.entry_nodes] = True
        return mask

    def terminal_nodes(self) -> np.ndarray:
        """Degree-1 non-entry nodes: fixed (terminating) pressure."""
        deg = self.degree
        mask = (deg == 1) & ~self.is_entry_node()
        return np.nonzero(mask)[0].astype(np.int32)

    def unknown_nodes(self) -> np.ndarray:
        """Nodes carrying a pressure unknown.

        The reference assigns an ``argsIndex`` to every node that is not the
        root and has degree != 1 (fluidSimulation.py:558-562); entry nodes
        and degree-1 nodes have prescribed pressures.
        """
        deg = self.degree
        mask = (deg != 1) & ~self.is_entry_node()
        return np.nonzero(mask)[0].astype(np.int32)

    def args_index(self) -> Dict[str, np.ndarray]:
        """Unknown-vector layout matching the reference.

        The unknown vector is ``[v_0 .. v_{E-1}, p_{i0} .. p_{iM-1}]`` where
        edge velocities come first in edge-index order and unknown node
        pressures follow in node-index order (fluidSimulation.py:549-562).

        Returns a dict with:
          * ``edge_args``: int32[E], position of each edge velocity (== arange)
          * ``node_args``: int32[N], position of each node pressure or -1
          * ``num_unknowns``: E + M
        """
        E = self.num_edges
        edge_args = np.arange(E, dtype=np.int32)
        node_args = np.full(self.num_nodes, -1, dtype=np.int32)
        unknown = self.unknown_nodes()
        node_args[unknown] = E + np.arange(unknown.shape[0], dtype=np.int32)
        return {
            "edge_args": edge_args,
            "node_args": node_args,
            "num_unknowns": E + unknown.shape[0],
        }

    # ------------------------------------------------------------------
    # Physical-unit accessors
    # ------------------------------------------------------------------
    def radius_m(self) -> np.ndarray:
        return self.radius * self.spacing

    def length_m(self) -> np.ndarray:
        return self.length * self.spacing

    def replace(self, **kwargs) -> "FlowNetwork":
        return dataclasses.replace(self, **kwargs)

    def to_networkx(self):
        """Graph view for networkx interop (the reference's network IS an
        ``nx.Graph`` + info dicts; ``getNetwork``, fluidSimulation.py:2878,
        just returns it).  Nodes carry depth (+ pressure when solved),
        edges carry radius/length/c/k in voxel units (+ flow/velocity
        when solved) and their edge index.

        Returns ``nx.Graph`` when every node pair carries at most one
        edge (the reference's shape), else ``nx.MultiGraph`` — parallel
        arcs are legal in this framework (``validate_network`` only
        warns about them) and a plain Graph would silently drop all but
        the last arc of each pair along with its attributes."""
        import networkx as nx

        pairs = {(min(int(h), int(t)), max(int(h), int(t)))
                 for h, t in zip(self.heads, self.tails)}
        G = nx.Graph() if len(pairs) == self.num_edges else nx.MultiGraph()
        for n in range(self.num_nodes):
            attrs = {"depth": int(self.node_depth[n])}
            if self.node_pressure is not None:
                attrs["pressure"] = float(self.node_pressure[n])
            G.add_node(n, **attrs)
        for e in range(self.num_edges):
            attrs = {"edge_index": e,
                     "radius": float(self.radius[e]),
                     "length": float(self.length[e]),
                     "c": float(self.c[e]), "k": float(self.k[e])}
            if self.edge_flow is not None:
                attrs["flow"] = float(self.edge_flow[e])
            if self.edge_velocity is not None:
                attrs["velocity"] = float(self.edge_velocity[e])
            G.add_edge(int(self.heads[e]), int(self.tails[e]), **attrs)
        return G

    # ------------------------------------------------------------------
    # Validation
    # ------------------------------------------------------------------
    def validate(self) -> None:
        E, N = self.num_edges, self.num_nodes
        assert self.tails.shape == (E,)
        assert self.radius.shape == (E,)
        assert self.length.shape == (E,)
        assert self.c.shape == (E,)
        assert self.k.shape == (E,)
        assert self.heads.min() >= 0 and self.tails.max() < N
        hd = self.node_depth[self.heads]
        td = self.node_depth[self.tails]
        assert np.all(hd <= td), "edge heads must be the lower-depth endpoint"


def orient_edges_by_depth(heads, tails, node_depth):
    """Swap endpoints so the head is the lower-depth one (reference
    convention, fluidSimulation.py:929-932)."""
    heads = np.asarray(heads, dtype=np.int32)
    tails = np.asarray(tails, dtype=np.int32)
    swap = node_depth[heads] > node_depth[tails]
    new_heads = np.where(swap, tails, heads)
    new_tails = np.where(swap, heads, tails)
    return new_heads, new_tails


def make_network(
    edges,
    node_depth,
    radius,
    length,
    c=None,
    k=None,
    entry_nodes=(0,),
    spacing=DEFAULT_SPACING,
) -> FlowNetwork:
    """Build a FlowNetwork from an edge list, enforcing head/tail orientation."""
    edges = np.asarray(edges, dtype=np.int32)
    node_depth = np.asarray(node_depth, dtype=np.int32)
    heads, tails = orient_edges_by_depth(edges[:, 0], edges[:, 1], node_depth)
    E = heads.shape[0]
    if c is None:
        c = np.full(E, 1.0)
    if k is None:
        k = np.full(E, 1.852)
    net = FlowNetwork(
        heads=heads,
        tails=tails,
        node_depth=node_depth,
        radius=np.asarray(radius, dtype=np.float64),
        length=np.asarray(length, dtype=np.float64),
        c=np.asarray(c, dtype=np.float64),
        k=np.asarray(k, dtype=np.float64),
        entry_nodes=np.asarray(entry_nodes, dtype=np.int32),
        spacing=spacing,
    )
    net.validate()
    return net


def validate_network(net: FlowNetwork) -> Dict[str, object]:
    """Full network-consistency audit — the reference's ``validateNetwork``
    slot (fluidSimulation.py:2804-2805), declared as an empty ``pass``
    there, finished here.

    Checks structural integrity (index ranges, self-loops, the head =
    lower-depth-endpoint orientation convention), physical plausibility
    (positive finite radii/lengths, positive c, k in a sane range),
    entry-node validity, and entry-rooted connectivity; reports (without
    failing) parallel arcs, cycle count, and the degree census the
    reference prints after segment processing (skeletonization.py:293-297).

    Returns
    -------
    dict with ``ok`` (bool), ``errors`` (list of str — any entry makes the
    network unusable for a solve), ``warnings`` (list of str), and
    ``stats`` (degree histogram, terminal/bifurcation/entry counts,
    independent-cycle count, unknown-pressure count).
    """
    errors: list = []
    warnings: list = []
    E, N = net.num_edges, net.num_nodes

    def _arr(x, dtype=np.float64):
        return np.asarray(x, dtype=dtype)

    # --- structural integrity ----------------------------------------
    heads, tails = _arr(net.heads, np.int64), _arr(net.tails, np.int64)
    if E and (heads.min() < 0 or heads.max() >= N
              or tails.min() < 0 or tails.max() >= N):
        errors.append("edge endpoint index out of range")
    else:
        n_self = int(np.sum(heads == tails))
        if n_self:
            errors.append(f"{n_self} self-loop edge(s)")
        hd, td = net.node_depth[heads], net.node_depth[tails]
        n_flipped = int(np.sum(hd > td))
        if n_flipped:
            errors.append(
                f"{n_flipped} edge(s) violate the head=lower-depth "
                "orientation convention (fluidSimulation.py:929-932)")
        pair = np.stack([np.minimum(heads, tails),
                         np.maximum(heads, tails)], 1)
        n_parallel = E - len(np.unique(pair, axis=0))
        if n_parallel:
            warnings.append(f"{n_parallel} parallel arc(s) between the "
                            "same node pair")

    # --- physical attributes -----------------------------------------
    for name, lo in (("radius", 0.0), ("length", 0.0), ("c", 0.0)):
        v = _arr(getattr(net, name))
        if v.shape != (E,):
            errors.append(f"{name} shape {v.shape} != ({E},)")
        elif not np.all(np.isfinite(v)):
            errors.append(f"non-finite {name}")
        elif E and v.min() <= lo:
            errors.append(f"non-positive {name} (min {v.min():.3g})")
    kv = _arr(net.k)
    if kv.shape != (E,):
        errors.append(f"k shape {kv.shape} != ({E},)")
    elif not np.all(np.isfinite(kv)):
        errors.append("non-finite k")
    elif E and (kv.min() <= 0 or kv.max() > 4.0):
        errors.append(f"k outside (0, 4] (range [{kv.min():.3g}, "
                      f"{kv.max():.3g}])")

    # --- entry nodes + connectivity ------------------------------------
    entry = _arr(net.entry_nodes, np.int64)
    if entry.size == 0:
        errors.append("no entry nodes")
    elif entry.min() < 0 or entry.max() >= N:
        errors.append("entry node index out of range")
    elif not errors:
        # BFS over boolean frontiers; N is small (graph scale, not voxel)
        adj_ok = True
        reached = np.zeros(N, dtype=bool)
        reached[entry] = True
        frontier = reached.copy()
        while frontier.any():
            nxt = np.zeros(N, dtype=bool)
            sel = frontier[heads]
            nxt[tails[sel]] = True
            sel = frontier[tails]
            nxt[heads[sel]] = True
            frontier = nxt & ~reached
            reached |= frontier
        n_unreached = int(N - reached.sum())
        if n_unreached:
            errors.append(f"{n_unreached} node(s) unreachable from the "
                          "entry nodes")

    # --- simulation-state shape checks ---------------------------------
    for name, want in (("node_pressure", (N,)), ("edge_velocity", (E,)),
                       ("edge_flow", (E,))):
        v = getattr(net, name)
        if v is not None and np.asarray(v).shape != want:
            errors.append(f"{name} shape {np.asarray(v).shape} != {want}")

    # --- census ---------------------------------------------------------
    deg = net.degree
    hist = np.bincount(deg, minlength=5)
    n_indep_cycles = E - N + 1 if not errors else None
    stats = {
        "num_nodes": N,
        "num_edges": E,
        "degree_histogram": {int(d): int(c) for d, c in enumerate(hist)
                             if c},
        "n_terminals": int(net.terminal_nodes().shape[0]),
        "n_bifurcations": int(np.sum(deg >= 3)),
        "n_entry": int(entry.size),
        "n_independent_cycles": n_indep_cycles,
        "n_unknown_pressures": int(net.unknown_nodes().shape[0]),
    }
    if n_indep_cycles:
        warnings.append(f"{n_indep_cycles} independent cycle(s) (merge "
                        "arcs / Circle of Willis loops)")

    return {"ok": not errors, "errors": errors, "warnings": warnings,
            "stats": stats}
