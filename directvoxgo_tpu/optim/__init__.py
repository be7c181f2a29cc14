from .masked_adam import MaskedAdam, adam_param_update, init_adam_state
