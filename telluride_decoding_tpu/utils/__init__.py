"""Results/CSV/plot/TensorBoard helpers."""

from telluride_decoding_tpu.utils.csv_util import (
    read_all_results_from_directory,
    write_results,
)
from telluride_decoding_tpu.utils.summaries import SummaryWriter
from telluride_decoding_tpu.utils.profiling import (
    StageTimer,
    timed_block,
    trace,
)
from telluride_decoding_tpu.utils.results import (
    best_parameter,
    collect_sweep_results,
    parse_results_file,
)
from telluride_decoding_tpu.utils.stats_bounds import (
    BoundViolation,
    GoldenResults,
    check_within_bounds,
)
