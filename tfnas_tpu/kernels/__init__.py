from .fused_dw import fold_bn_mask, fused_dw_norm_act

__all__ = ["fold_bn_mask", "fused_dw_norm_act"]
