"""Host-side data layer: datasets, collators, bucketed loaders."""
from ditsep_tpu.data.latent_ds import (
    LatentDataset,
    save_latent_cache,
    save_latent_metadata,
)
from ditsep_tpu.data.dataset import (
    PadCropNormalized,
    PreEncodedDataset,
    SampleDataset,
    mono,
    phase_flipper,
    stereo,
    volume_norm,
)
from ditsep_tpu.data.vctk_demand import NoisyDataset
from ditsep_tpu.data.webdataset import (
    LocalWebDatasetConfig,
    S3DatasetConfig,
    WebDatasetDataLoader,
    create_dataloader_from_config,
)
from ditsep_tpu.data.wsj0_mix import (
    BucketedLoader,
    SyntheticMixDataset,
    SyntheticTonalMixDataset,
    WSJ0Mix,
    length_buckets,
    max_collator,
    read_wav,
    write_wav,
)
