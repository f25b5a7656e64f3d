from guassianhand_tpu.utils.saving import (save_image, save_image_grid,
                                           save_video_frames, Saver)
from guassianhand_tpu.utils.profiling import trace_context, timed
