from .loss import l1_loss, psnr, rgb_loss, ssim  # noqa: F401
from .trainer import (  # noqa: F401
    CameraArrays,
    DensifyStats,
    TrainState,
    init_densify_stats,
    init_train_state,
    make_optimizer,
    make_train_step,
    render_model,
)
