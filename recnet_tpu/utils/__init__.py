from recnet_tpu.utils.logging import MetricWriter
