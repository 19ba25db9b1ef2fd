"""Dataset assembly and TF-free TFRecord I/O."""

from telluride_decoding_tpu.data.records import (
    FeatureSpec,
    count_tfrecords,
    convert_data_to_tfrecords,
    discover_feature_shapes,
    encode_example,
    iter_tfrecords,
    parse_example,
    read_tfrecords,
    write_tfrecords,
)
from telluride_decoding_tpu.data.brain_data import (
    BrainData,
    BrainDataset,
    TestBrainData,
    TFExampleData,
    create_brain_dataset,
)
