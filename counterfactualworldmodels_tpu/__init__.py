"""counterfactualworldmodels_tpu: a TPU-native Counterfactual World Models framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
neuroailab/CounterfactualWorldModels: VideoMAE-style masked predictors,
counterfactual motion prompting, RAFT optical flow, Spelke-object
segmentation, movability and motion-covariance estimation — designed
TPU-first (static shapes, pure functions, vmap over counterfactual samples,
pjit/shard_map over device meshes).
"""

__version__ = '0.1.0'

from . import ops, masking, models, pipelines, parallel, training, utils  # noqa: F401
from .pipelines import (PredictorBasedGenerator, FlowGenerator,  # noqa: F401
                        MovabilityPredictor, ImuGenerator,
                        ImuConditionedFlowGenerator, FlowSampleFilter)
from .interface import CounterfactualPredictionInterface  # noqa: F401
