from .similarity import (
    cosine_sim, order_sim, euclidean_sim, l1_sim, l2_sim,
    l1_sim_norm, l2_sim_norm, jaccard_sim, get_sim, l2norm, cal_error,
)
