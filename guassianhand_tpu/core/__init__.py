from guassianhand_tpu.core.gaussians import Gaussians
from guassianhand_tpu.core.camera import Camera, intrinsic_to_fov, projection_matrix_from_K
from guassianhand_tpu.core import sh, transforms
