from mint_tpu.data.example import decode_example, encode_example  # noqa: F401
from mint_tpu.data.pipeline import (  # noqa: F401
    create_input,
    fact_preprocessing,
    get_modality_to_param_dict,
    parse_example,
)
from mint_tpu.data.tfrecord import (  # noqa: F401
    TFRecordWriter,
    crc32c,
    masked_crc32c,
    read_many,
    read_records,
)
