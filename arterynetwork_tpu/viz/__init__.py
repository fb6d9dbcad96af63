from .network_plot import (
    plot_flow_per_compartment,
    plot_network,
    plot_root_pressure_over_time,
    plot_terminating_pressure_distribution,
    plot_tp_vs_path_length,
)
from .helpers import generate_colormap, line_plot_binned, box_plot_whiskers

__all__ = [
    "plot_network",
    "plot_terminating_pressure_distribution",
    "plot_flow_per_compartment",
    "plot_root_pressure_over_time",
    "plot_tp_vs_path_length",
    "generate_colormap",
    "line_plot_binned",
    "box_plot_whiskers",
]
