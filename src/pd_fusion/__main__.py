"""``python -m pd_fusion`` == ``python -m pd_fusion.cli``."""
from pd_fusion.cli import main

if __name__ == "__main__":
    main()
