from guassianhand_tpu.mano.lbs import lbs, ManoModel, mano_forward
from guassianhand_tpu.mano.model import load_mano_model, synthetic_mano_model
