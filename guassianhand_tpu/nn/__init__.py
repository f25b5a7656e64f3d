from guassianhand_tpu.nn.mlp import MLP, MLPBlock, ResnetBlockFC
from guassianhand_tpu.nn.spatial import positional_encoding, pe_dim
from guassianhand_tpu.nn.transformer import Transformer1D
from guassianhand_tpu.nn.pointnet import LocalPoolPointnet
from guassianhand_tpu.nn.tokenizers import TriplaneLearnablePositionalEmbedding, TriplaneUpsampler
from guassianhand_tpu.nn.heads import GSLayer, VertValid, VertPosRefinement, AdditionalFeaturesFC, SelfAttn
