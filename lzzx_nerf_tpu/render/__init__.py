"""Static-shape volume renderer (reference: nerf_triplane/renderer.py)."""

from .state import OccupancyState, RenderSettings, init_occupancy_state
from .renderer import render_rays, render_rays_compact, run_torso
from .grid_update import (update_density_grid, update_torso_grid,
                          mark_untrained_grid, probe_field_grid)
