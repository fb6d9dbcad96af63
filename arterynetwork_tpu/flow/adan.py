"""ADAN-derived Hazen-Williams coefficient model (reference C13 part).

``setNetwork`` option 2 (fluidSimulation.py:401-439) assigns each edge a
Hazen-Williams ``c`` from a linear regression of ADAN simulation results
against radius, and one global exponent ``k``:

    c = slope_c_radius * radius_m + intercept_c_radius
    c = 1        if 1.5 mm <= radius <= 2.5 mm
    c = 0.1      if the regression gives c < 0 (outside that band)

The regression constants live in the reference's ``resultADANDict.pkl``
(not redistributable); ``ADANModel`` defaults reproduce the c≈1 regime the
reference operates in and can be loaded from the original pickle via
``ADANModel.from_dict`` when available.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..graphs.network import FlowNetwork


@dataclasses.dataclass
class ADANModel:
    slope_c_radius: float = 0.0
    intercept_c_radius: float = 1.0
    k: float = 1.852
    radius_thresholds: Optional[np.ndarray] = None  # meters, for binning
    ck_candidates: Optional[np.ndarray] = None
    slope_pressure_path_length: float = -10000.0    # Pa/m
    intercept_pressure_path_length: float = 0.0

    @classmethod
    def from_dict(cls, d):
        """Build from the reference's resultADANDict contents."""
        return cls(
            slope_c_radius=float(d["slopeCRadius"]),
            intercept_c_radius=float(d["interceptCRadius"]),
            k=float(np.asarray(d["CKCandidates"])[-1]),
            radius_thresholds=np.asarray(d.get("radiusThresholds")),
            ck_candidates=np.asarray(d.get("CKCandidates")),
            slope_pressure_path_length=float(
                d.get("slopePressurePathLength", -10000.0)),
            intercept_pressure_path_length=float(
                d.get("interceptPressurePathLength", 0.0)),
        )

    def c_of_radius(self, radius_m):
        radius_m = np.asarray(radius_m, float)
        c = self.slope_c_radius * radius_m + self.intercept_c_radius
        in_band = (radius_m * 1000 >= 1.5) & (radius_m * 1000 <= 2.5)
        c = np.where(in_band, 1.0, np.where(c < 0, 0.1, c))
        return c


def set_network_ck(net: FlowNetwork, model: ADANModel = None) -> FlowNetwork:
    """Assign c and k per edge from the ADAN model (setNetwork option 2)."""
    if model is None:
        model = ADANModel()
    c = model.c_of_radius(net.radius_m())
    k = np.full(net.num_edges, model.k)
    return net.replace(c=c, k=k)
