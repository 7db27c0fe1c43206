from .fused import phi_dot_ht, wt_dot_phi, cost_terms, supported

__all__ = ["phi_dot_ht", "wt_dot_phi", "cost_terms", "supported"]
