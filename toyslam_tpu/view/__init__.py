"""Matplotlib visualization (optional; import-guarded).

Parity targets: reference python/view/robot_view_2d.py (View,
RobotStateView, FootprintView2d) and python/view/graph_view_2d.py
(GraphView2d).  Everything renders offline/headless as well (Agg backend)
so CI can exercise it without a display.
"""

from toyslam_tpu.view.view2d import (
    View,
    RobotStateView,
    FootprintView2d,
    GraphView2d,
    render_result,
)

__all__ = [
    "View",
    "RobotStateView",
    "FootprintView2d",
    "GraphView2d",
    "render_result",
]
