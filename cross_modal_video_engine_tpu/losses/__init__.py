from .triplet import triplet_loss, TripletLossConfig
from .seqmll import multilabel_categorical_crossentropy, seq_mll_loss
from .distill import mse_distill, kl_distill, similarity_distill, huber
from .contrastive import info_nce_logits, clip_contrastive_loss
from .localization import (
    binary_logistic_regression_loss, bmn_loss, bmn_tem_loss,
    bmn_pem_reg_loss, bmn_pem_cls_loss, bsn_tem_loss, bsn_pem_loss,
    ohem_hinge_loss, ssn_loss, ssn_activity_loss, ssn_completeness_loss,
    ssn_classwise_regression_loss,
)
from .shuffle import cosine_away_loss, soft_label_smooth, soft_cross_entropy
from .hvu import hvu_loss
