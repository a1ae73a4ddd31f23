from recnet_tpu.data.vocab import Vocab
from recnet_tpu.data.batcher import Batcher, cycle, prefetch_to_device
from recnet_tpu.data.corpus import Corpus
from recnet_tpu.data.datasets import CaptionDataset, ScoreDataset
from recnet_tpu.data.bundle import (Bundle, build_bundle, bundle_dir,
                                    load_bundle, load_or_build)
