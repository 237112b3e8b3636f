from mind_tpu.common.geometry import (
    project_point_on_polyline,
    remove_close_points,
    point_line_distance,
    point_polyline_distance,
    wrap_angle,
)
from mind_tpu.common.kinematics import VehicleParam, kine_propagate, kine_propagate_np
from mind_tpu.common.bbox import BBOX_DIMS, bbox_for_type
from mind_tpu.common.tree import Tree, Node

__all__ = [
    "project_point_on_polyline",
    "remove_close_points",
    "point_line_distance",
    "point_polyline_distance",
    "wrap_angle",
    "VehicleParam",
    "kine_propagate",
    "kine_propagate_np",
    "BBOX_DIMS",
    "bbox_for_type",
    "Tree",
    "Node",
]
