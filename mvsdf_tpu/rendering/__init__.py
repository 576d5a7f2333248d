from .renderer import render_forward, RenderOut
from .implicit_diff import differentiable_surface_points
