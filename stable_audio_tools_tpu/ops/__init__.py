from .conv import WNConv1d, WNConvTranspose1d, Conv1d
from .activations import snake_beta, SnakeBeta, get_activation
from .norms import LayerNorm, RMSNorm, DynamicTanh, LayerScale
from .embeddings import FourierFeatures, RotaryEmbedding, apply_rotary_pos_emb
