from .layers import BiGRU, ConvBank1D, MFC, LatentMapping
from .dual_encoding import (
    DualEncodingConfig, DualEncoding, VideoBatch, TextBatch,
    VideoMultilevelEncoding, TextMultilevelEncoding,
    make_video_batch, make_text_batch,
)
from .clip import CLIPConfig, CLIPModel, VisionTower, TextTower
from .clip_resnet import (ModifiedResNet, ModifiedResNetConfig,
                          CLIPResNetModel, CLIPResNetConfig)
from .combiner import Combiner, CombinerConfig
from .timesformer import TimeSformer, TimeSformerConfig
from .resnet3d import (ResNet3D, ResNet3DConfig, SlowFast, SlowFastConfig,
                       X3D, X3DConfig, CSN, CSNConfig)
from .tpn import TPN, TPNConfig
from .ava_head import AVARoIHead, AVAHeadConfig, roi_align, ava_bbox_loss
from .lfb import (ACRNHead, ACRNHeadConfig, FBOAvg, FBOHead, FBOHeadConfig,
                  FBOMax, FBONonLocal, LFBBuilder, LongTermFeatureBank,
                  NonLocalLayer)
from .videoclip import VideoCLIP, VideoCLIPConfig
from .backbones2d import (TSMResNet, TSMConfig, C3D, R2Plus1D,
                          R2Plus1DConfig)
from .yolo import YoloV5, YoloConfig
from .decoder_head import RNNDecoderHead, RNNDecoderConfig
from .caption_transformer import CaptionTransformer, CaptionConfig
from .recognizer import (BackboneClassifier, Recognizer2D, Recognizer3D,
                         Recognizer3DShuffleEmb, Recognizer3DShuffleSoft,
                         Recognizer3DShuffleExtra,
                         Recognizer3DCLIP, Recognizer3DCaption,
                         Recognizer3DRelseq, TimeSformerHead, average_clip)
from .heads import I3DHead, SlowFastHead, TRNHead, TSNHead, X3DHead
from .stgcn import (STGCN, STGCNConfig, AGCN, AGCNConfig,
                    build_partitioned_adjacency)
from .videomae_vit import VideoMAEViT, VideoMAEConfig, sinusoid_table
