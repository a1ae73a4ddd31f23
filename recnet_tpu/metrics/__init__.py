from recnet_tpu.metrics.bleu import Bleu
from recnet_tpu.metrics.cider import Cider
from recnet_tpu.metrics.rouge import Rouge
from recnet_tpu.metrics.meteor import Meteor
from recnet_tpu.metrics.tokenizer import PTBTokenizer, ptb_tokenize_line
from recnet_tpu.metrics.spice import Spice
from recnet_tpu.metrics.score import (
    CaptionScorer, gts_from_pairs, res_from_dict)
