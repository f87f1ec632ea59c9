from .prediction import PredictorBasedGenerator, predict_video
from .segmentation import FlowGenerator, compute_flow_corrs
from .filters import FlowSampleFilter, flow_sample_filter
from .movability import (MovabilityPredictor, ImuConditionedMovabilityPredictor,
                         make_imu_conditioned_movability_predictor)
from .imu import ImuGenerator, ImuConditionedFlowGenerator
from .patch_selector import IterativePatchSelector
from . import perturbation
