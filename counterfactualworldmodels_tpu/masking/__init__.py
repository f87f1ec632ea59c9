from .mask_ops import (upsample_masks, patch_distance_transform,
                       patches_adjacent_to_visible, partition_masks,
                       rectangularize, invert_mask_frame)
from .generators import *  # noqa: F401,F403
