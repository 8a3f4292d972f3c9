from cuttana_ray.run import main

raise SystemExit(main())
