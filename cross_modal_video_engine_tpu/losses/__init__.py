from .triplet import triplet_loss, TripletLossConfig
from .seqmll import multilabel_categorical_crossentropy, seq_mll_loss
from .distill import mse_distill, kl_distill, similarity_distill, huber
from .contrastive import info_nce_logits, clip_contrastive_loss
