from .scorers import getScorer, APScorer, RRScorer, PrecisionScorer, DCGScorer, NDCGScorer
from .retrieval import (
    t2v, v2t, t2v_map, v2t_map, get_gt, eval_q2m, cal_perf,
)
from .accuracy import (
    top_k_accuracy, mean_class_accuracy, confusion_matrix,
    mean_average_precision, mmit_mean_average_precision,
    seq_average_precision,
)
from .proposals import (
    pairwise_temporal_iou, average_recall_at_avg_proposals,
    interpolated_precision_recall, average_precision_at_temporal_iou,
)
