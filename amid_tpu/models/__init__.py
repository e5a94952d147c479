from amid_tpu.models.amid import AMIDModel, build_model  # noqa: F401
