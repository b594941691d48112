from .shard import (  # noqa: F401
    make_mesh, receive_sharded, overlap_save_sharded, doppler_fft_sharded,
    pulse_train_pipeline,
)
