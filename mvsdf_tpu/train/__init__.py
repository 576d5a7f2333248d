from .step import make_train_step, init_params, TrainState
