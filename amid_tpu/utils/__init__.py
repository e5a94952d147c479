from amid_tpu.utils.logging import AverageMeter, init_logger  # noqa: F401
