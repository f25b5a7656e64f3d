from guassianhand_tpu.ops.projection import project_gaussians, Projected
from guassianhand_tpu.ops.rasterize import rasterize, RasterizeConfig, render_gaussians
