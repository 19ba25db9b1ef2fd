"""Results/CSV/plot/TensorBoard helpers."""

from telluride_decoding_tpu.utils.csv_util import (
    read_all_results_from_directory,
    write_results,
)
from telluride_decoding_tpu.utils.summaries import SummaryWriter
