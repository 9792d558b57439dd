from .checkpoints import (
    load_ckpt_state_dict,
    save_checkpoint,
    load_checkpoint,
    copy_state_dict,
)
