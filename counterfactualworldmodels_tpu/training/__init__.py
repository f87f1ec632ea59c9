from .train import (TrainState, make_optimizer, masked_prediction_loss,
                    make_train_step, init_train_state,
                    make_sharded_train_step, make_batch_masks,
                    accumulated_grads)
from .raft import (raft_sequence_loss, raft_flow_loss, end_point_error,
                   keypoint_distill_loss, make_raft_train_step,
                   make_keypoint_distill_step, init_raft_train_state,
                   make_sharded_raft_train_step, synthetic_flow_batch)
