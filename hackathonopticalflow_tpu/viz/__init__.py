from .draw import polylines, circle, rectangle, line, put_text, add_layers
from .layers import draw_flow, draw_grid, draw_grid_vectors, draw_hsv, draw_sparse_lamps, draw_sparse_hsv, draw_tracks, mark_points
from .plotter import Plotter, draw_plot

__all__ = [
    "polylines",
    "circle",
    "rectangle",
    "line",
    "put_text",
    "add_layers",
    "draw_flow",
    "draw_grid",
    "draw_hsv",
    "draw_sparse_lamps",
    "draw_sparse_hsv",
    "draw_grid_vectors",
    "draw_tracks",
    "mark_points",
    "Plotter",
    "draw_plot",
]
