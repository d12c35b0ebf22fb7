"""Static-shape volume renderer (reference: nerf_triplane/renderer.py)."""

from .state import OccupancyState, RenderSettings, init_occupancy_state
from .renderer import (TorsoPlan, build_torso_plan, render_rays,
                       render_rays_compact, render_rays_compact_blocks,
                       render_rays_train_compact, run_torso,
                       run_torso_compact)
from .grid_update import (update_density_grid, update_torso_grid,
                          make_density_grid_update, make_torso_grid_update,
                          mark_untrained_grid, probe_field_grid)
