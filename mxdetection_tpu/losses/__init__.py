from .losses import (  # noqa: F401
    mask_bce_loss,
    ohem_select,
    sigmoid_focal_loss,
    smooth_l1_loss,
    softmax_ce_loss,
)
