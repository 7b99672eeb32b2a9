from nis_sar_amtigmti_video_tpu.cli import main

main()
