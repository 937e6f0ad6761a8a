from kspider_tpu.cli.main import main

main()
