from .ground_truth import GroundTruthResult, create_ground_truth
from .physics import (
    dp_from_flow,
    edge_admittance,
    flow_from_dp,
    flow_from_velocity,
    signed_flow_from_dp,
    velocity_from_flow,
)
from .residual import pack_velocity_pressure, residual_reference, validate_equations
from .solvers import FlowSolution, solve_poiseuille, solve_pressure_newton
from .system import FlowSystem, build_system
from .adan import ADANModel, set_network_ck
from .tree_solver import EliminationPlan, plan_elimination

__all__ = [
    "GroundTruthResult",
    "create_ground_truth",
    "dp_from_flow",
    "edge_admittance",
    "flow_from_dp",
    "flow_from_velocity",
    "signed_flow_from_dp",
    "velocity_from_flow",
    "pack_velocity_pressure",
    "residual_reference",
    "validate_equations",
    "FlowSolution",
    "solve_poiseuille",
    "solve_pressure_newton",
    "FlowSystem",
    "build_system",
    "ADANModel",
    "set_network_ck",
    "EliminationPlan",
    "plan_elimination",
]
