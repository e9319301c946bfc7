"""Command-line entry points, preserving the reference CLI semantics:

  python -m dmhomo_tpu.cli.make_conditions ~ UnHomoTrainData's implicit
                                            condition build, done once
  python -m dmhomo_tpu.cli.dgm_train      ~ accelerate launch DGM/demo.py
  python -m dmhomo_tpu.cli.dgm_sample     ~ python DGM/dgm_sample.py
  python -m dmhomo_tpu.cli.make_samples   ~ python DGM/generate_nyps_to_single_case.py
  python -m dmhomo_tpu.cli.hem_train      ~ accelerate launch HEM/train.py
  python -m dmhomo_tpu.cli.hem_eval       ~ accelerate launch hem_evaluate.py
  python -m dmhomo_tpu.cli.video_to_frames ~ python video2img.py
"""
