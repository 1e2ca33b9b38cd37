from pisa_ray.cli import main

raise SystemExit(main())
