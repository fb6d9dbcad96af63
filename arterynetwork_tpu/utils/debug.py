"""Numerical-safety utilities (SURVEY.md §5 "race detection/sanitizers"
slot).

The reference guards its residual against NaN/Inf by printing
(fluidSimulation.py:4699-4712) and cross-checks GUI data structures
manually.  Equivalents here: explicit finite checks with context, global
NaN trapping, and a solution validity gate for the solvers (the
reference's ``success`` flags, :594-596)."""

from __future__ import annotations

from typing import Iterable

import jax
import numpy as np


def enable_nan_checks(enable: bool = True):
    """Trap NaNs at their producing op (jax debug_nans)."""
    jax.config.update("jax_debug_nans", enable)


def check_finite(tree, name: str = "value"):
    """Raise with context if any leaf contains non-finite entries."""
    for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        bad = ~np.isfinite(arr)
        if bad.any():
            idx = np.argwhere(bad)[0]
            raise FloatingPointError(
                f"{name}: leaf {i} has {bad.sum()} non-finite entries "
                f"(first at index {tuple(idx)})")
    return tree


def assert_solution_valid(solution, max_nodal_imbalance=1e-9,
                          name="flow solution"):
    """Failure detection for the solvers: finite fields and conservation
    within tolerance, else a diagnostic error (instead of the reference's
    silent success=False)."""
    check_finite((solution.pressure, solution.flow, solution.velocity),
                 name)
    rn = float(np.asarray(solution.residual_norm))
    if rn > max_nodal_imbalance:
        raise ValueError(
            f"{name}: max nodal flow imbalance {rn:.3e} m^3/s exceeds "
            f"{max_nodal_imbalance:.1e} — solver did not converge "
            f"({int(np.asarray(solution.iterations))} iterations)")
    return solution
