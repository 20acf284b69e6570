from cheque_ocr_project_ray.fixtures.gen import (
    ensure_fixture,
    generate_fixture,
    tier_for_sf_dir,
)

__all__ = ["ensure_fixture", "generate_fixture", "tier_for_sf_dir"]
