"""QA / evaluation harness: RMSE, PSNR, SSIM, LPIPS (+ masked DTU variants),
with the reference's FrameWise/SceneWise CSV + QA_Scores.json contract."""

from vipnerf_tpu.qa.runner import run_all_qa, start_qa  # noqa: F401
