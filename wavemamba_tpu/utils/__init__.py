from wavemamba_tpu.utils.img_util import (
    batch2img,
    crop_border,
    imfrombytes,
    imread,
    imwrite,
    img2batch,
    padding,
)
from wavemamba_tpu.utils.misc import (
    check_resume,
    get_time_str,
    make_exp_dirs,
    mkdir_and_rename,
    scandir,
    set_random_seed,
    sizeof_fmt,
)
from wavemamba_tpu.utils.registry import (
    ARCH_REGISTRY,
    DATASET_REGISTRY,
    LOSS_REGISTRY,
    METRIC_REGISTRY,
    MODEL_REGISTRY,
    Registry,
)
