from .patches import (patchify, unpatchify, num_patches, mask_shape,
                      canonical_patch_size, average_within_patches)
from .pos_embed import sinusoid_encoding_table
from .normalization import (imagenet_normalize, imagenet_unnormalize,
                            IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD)
from .coords import coordinate_ims
from .flow_viz import flow_to_rgb, hsv_to_rgb, FlowToRgb
from .sampling import (boltzmann, sample_image_inds_from_probs,
                       sample_from_energy, index_into_images, sample_per_pixel)
from .misc import (spatial_moments_from_local_dist, get_distribution_centroid,
                   soft_index, channel_mse, channel_l1error, channel_l2error,
                   max_delta_error, l1_loss, l2_loss, charbonnier_loss,
                   masked_per_pixel_loss, masked_bce_loss, weighted_softmax,
                   masked_kl_div_loss, masked_sequence_loss,
                   confidence_thresh_samples)
from .misc import (get_local_neighbors, get_patches,
                   spatial_moments_to_circular_target,
                   circular_target_to_spatial_moment,
                   estimate_boundary_orientations, compute_local_effects,
                   local_average, get_mask_boundaries)
