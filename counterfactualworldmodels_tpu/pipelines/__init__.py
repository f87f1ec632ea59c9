from .prediction import PredictorBasedGenerator, predict_video
from .segmentation import FlowGenerator, compute_flow_corrs
from .filters import FlowSampleFilter, flow_sample_filter
from .movability import MovabilityPredictor
from . import perturbation
