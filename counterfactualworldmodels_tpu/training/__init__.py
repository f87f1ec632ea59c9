from .train import (TrainState, make_optimizer, masked_prediction_loss,
                    make_train_step, init_train_state,
                    make_sharded_train_step, make_batch_masks)
