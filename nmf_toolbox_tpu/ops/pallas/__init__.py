from .fused import phi_dot_ht, wt_dot_phi, cost_terms

__all__ = ["phi_dot_ht", "wt_dot_phi", "cost_terms"]
