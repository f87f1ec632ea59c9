from .patches import (patchify, unpatchify, num_patches, mask_shape,
                      canonical_patch_size, average_within_patches)
from .pos_embed import sinusoid_encoding_table
from .normalization import (imagenet_normalize, imagenet_unnormalize,
                            IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD)
from .coords import coordinate_ims
from .flow_viz import flow_to_rgb, hsv_to_rgb, FlowToRgb
from .sampling import (boltzmann, sample_image_inds_from_probs,
                       sample_from_energy, index_into_images, sample_per_pixel)
