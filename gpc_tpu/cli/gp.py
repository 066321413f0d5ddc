"""`gp` command-line tool: GP regression (counterpart of gp.cpp).

Commands: learn / relearn / display / gnuplot, plus test / predict /
log-likelihood (declared but commented out in the reference, gp.cpp:42-47 —
provided here as a working superset with ivm-command semantics).  Usage:

    python -m gpc_tpu.cli.gp [-v verbosity] [-s seed] learn [options] data.svml [model]
"""

from __future__ import annotations

import sys

import numpy as np

from gpc_tpu.cli.common import CommandLine, ExitError, KernelSpecParser, load_data, write_unheaded
from gpc_tpu.io import model_io
from gpc_tpu.models.gp import GP


def _help():
    print("GP regression tool (gpc_tpu).\n"
          "Commands:\n"
          "  gp learn [options] data.svml [model]    train a GP\n"
          "  gp relearn [options] data.svml model    continue training\n"
          "  gp display [model]                      show a stored model\n"
          "  gp gnuplot [options] data.svml [model] [name]  plot artifacts\n"
          "  gp test data.svml [model]               MSE against targets\n"
          "  gp predict data.svml [model] [out]      posterior means to file\n"
          "  gp log-likelihood data.svml [model]     marginal likelihood\n"
          "Learn options: -C centre (1) -S scale (0) -L learn-scales (0)\n"
          "  -A ftc|dtc|dtcvar|fitc|pitc  -a active-set-size  -k kernel (rbf|lin|mlp|poly|exp|ratquad)\n"
          "  -g gamma -v variance -w weight-var -b bias-var -d degree -i input-select\n"
          "  -O scg|conjgrad|graddesc  -# iters  -f format\n"
          "  -c ckpt-file [--checkpoint-every N] [-r resume]  preemption checkpoints")


def learn(cl: CommandLine):
    cl.advance()
    cl.mode = "learn"
    ks = KernelSpecParser()
    centre, scale_data, learn_scales = True, False, False
    approx, active = "ftc", -1
    iters = 1000
    optimiser = "scg"
    model_file = "gp_model"
    ckpt_path, ckpt_every, resume = None, 50, False
    while cl.is_flag():
        arg = cl.current()
        if arg in ("-?", "-h", "--help"):
            _help()
            return
        elif arg in ("-c", "--checkpoint"):
            # extension beyond the reference (SURVEY §5): periodic atomic
            # SCG-state checkpoints for preemption recovery
            ckpt_path = cl.get_string(); cl.advance()
        elif arg == "--checkpoint-every":
            ckpt_every = cl.get_int(); cl.advance()
        elif arg in ("-r", "--resume"):
            resume = True; cl.advance()
        elif arg in ("-C", "--Centre-data"):
            centre = cl.get_bool(); cl.advance()
        elif arg in ("-L", "--Learn-scales"):
            learn_scales = cl.get_bool(); cl.advance()
        elif arg in ("-S", "--Scale-data"):
            scale_data = cl.get_bool(); cl.advance()
        elif arg in ("-a", "--active-set-size"):
            active = cl.get_int(); cl.advance()
        elif arg in ("-A", "--Approximation-type"):
            approx = cl.get_string(); cl.advance()
        elif arg in ("-O", "--optimiser"):
            optimiser = cl.get_string(); cl.advance()
        elif arg in ("-#", "--#iterations"):
            iters = cl.get_int(); cl.advance()
        elif arg in ("-f", "--file-format"):
            cl.file_format = cl.get_int(); cl.advance()
        elif ks.handle(cl):
            pass
        else:
            raise ExitError(f"Unrecognised flag: {cl.current()}")
    data_file = cl.current()
    if cl.pos + 1 < len(cl.argv):
        model_file = cl.argv[cl.pos + 1]

    X, y = load_data(data_file, cl.file_format)
    kern, kern_params = ks.build(X.shape[1], default_type="rbf")

    if approx == "ftc":
        active = 0
    elif approx in ("fitc", "pitc"):
        # superset: the reference CLI blocks FITC ("currently not working",
        # gp.cpp:363-366) and PITC is stubbed (CGp.cpp:862-871) — both are
        # implemented and tested here (models/gp.py, test_gp.py).
        pass
    elif approx == "dtcvar":
        print("Warning: numerical stabilities exist in DTCVAR approximation.")
    elif approx != "dtc":
        raise ExitError(f"Unknown sparse approximation type: {approx}.")
    if approx != "ftc" and active <= 0:
        raise ExitError("You must choose an active set size (option -a) for the command learn.")
    if optimiser not in ("scg", "conjgrad", "graddesc", "quasinew"):
        raise ExitError(f"Unrecognised optimiser type: {optimiser}")

    model = GP(kern, X, y, approx=approx, num_active=max(active, 0),
               learn_scales=learn_scales, centre=centre, scale_data=scale_data,
               beta=1.0, seed=cl.seed)
    # overwrite kernel init with the CLI-specified parameters
    import jax.numpy as jnp
    model.theta = jnp.asarray(model.spec.pack(
        kern_params, X_u=model.inducing(),
        scales=model.fixed_scales if learn_scales else None,
        beta=1.0 if model.spec.sparse else None))
    res = model.optimise(iters=iters, optimiser=optimiser, verbose=cl.verbosity,
                         ckpt_path=ckpt_path, ckpt_every=ckpt_every,
                         resume=resume)
    if cl.verbosity > 0:
        print(model.display())
        print(f"Final objective: {float(res.obj)} after {int(res.iters)} iterations")
    comment = "Run as: " + " ".join(sys.argv) + f" with seed {cl.seed}."
    model_io.write_gp(model_file, model, comment)


def relearn(cl: CommandLine):
    cl.advance()
    cl.mode = "relearn"
    iters = 1000
    optimiser = "scg"
    while cl.is_flag():
        arg = cl.current()
        if arg in ("-#", "--#iterations"):
            iters = cl.get_int(); cl.advance()
        elif arg in ("-O", "--optimiser"):
            optimiser = cl.get_string(); cl.advance()
            if optimiser not in ("scg", "conjgrad", "graddesc", "quasinew"):
                raise ExitError(f"Unrecognised optimiser type: {optimiser}")
        else:
            raise ExitError(f"Unrecognised flag: {cl.current()}")
    data_file = cl.current()
    model_file = cl.argv[cl.pos + 1] if cl.pos + 1 < len(cl.argv) else "gp_model"
    # the reference writes the retrained model to the THIRD positional
    # newModelFileName (default gp_model) — the input model file is never
    # overwritten unless named again (gp.cpp:446-447, 480-515)
    new_model_file = (cl.argv[cl.pos + 2] if cl.pos + 2 < len(cl.argv)
                      else "gp_model")
    X, y = load_data(data_file, cl.file_format)
    try:
        model = model_io.read_gp(model_file, X=X, y=y)
    except model_io.DataDimensionError:
        # gp.cpp:502-503 (read_gp rebuilds the spec from X, so the check
        # must run against the FILE's inputDim inside the reader)
        raise ExitError(f"{data_file}: input data is not of correct dimension")
    res = model.optimise(iters=iters, optimiser=optimiser, verbose=cl.verbosity)
    if cl.verbosity > 0:
        print(model.display())
        print(f"Final objective: {float(res.obj)} after {int(res.iters)} iterations")
    comment = "Run as: " + " ".join(sys.argv) + f" with seed {cl.seed}."
    model_io.write_gp(new_model_file, model, comment)


def display(cl: CommandLine):
    cl.advance()
    model_file = cl.current() if cl.has_more() else "gp_model"
    model = model_io.read_gp(model_file)
    print(model.display())


def _load_model_and_data(cl, default_model="gp_model"):
    """Re-attach the given data to a stored model, as gnuplot/relearn do
    (readGpFromFile re-attaches py/pX, gp.cpp:620-622)."""
    data_file = cl.current()
    model_file = cl.argv[cl.pos + 1] if cl.pos + 1 < len(cl.argv) else default_model
    X, y = load_data(data_file, cl.file_format)
    try:
        model = model_io.read_gp(model_file, X=X, y=y)
    except model_io.DataDimensionError:
        raise ExitError(f"{data_file}: input data is not of correct dimension")
    return model, X, y


def test_cmd(cl: CommandLine):
    """Superset command: declared but commented out in the reference gp
    (gp.cpp:42-47); semantics follow ivm's test (CNoise::test MSE print,
    CNoise.cpp:464-473)."""
    cl.advance()
    model, X, y = _load_model_and_data(cl)
    mu, _ = model.predict(X)
    mse = np.mean((np.asarray(y) - np.asarray(mu)) ** 2, axis=0)
    for j, v in enumerate(np.atleast_1d(mse)):
        print(f"Mean Squared Error on output {j + 1}: {float(v)}")


def predict_cmd(cl: CommandLine):
    """Superset command (gp.cpp:42-47): posterior means at the data inputs,
    written unheaded like ivm predict."""
    cl.advance()
    model, X, _ = _load_model_and_data(cl)
    pred_file = cl.argv[cl.pos + 2] if cl.pos + 2 < len(cl.argv) else "gp_predictions"
    mu, _ = model.predict(X)
    write_unheaded(pred_file, np.asarray(mu))


def log_likelihood_cmd(cl: CommandLine):
    """Superset command (gp.cpp:42-47): marginal log likelihood of the stored
    hyperparameters on the given data."""
    cl.advance()
    model, _, _ = _load_model_and_data(cl)
    print(f"Model log likelihood: {model.log_likelihood()}")


def _gnuplot_classification(model, X, y, name, resolution, point_size,
                            line_width):
    """probit/ncnm gp plot branch (gp.cpp:635-750): inducing-set file,
    per-class scatter files (trailing 0 column), class-one probability grid
    and the 0.5-decision / 0.25-0.75-contour script.

    The reference leaves the probability fill as a TODO and streams the
    uninitialized CMatrix (gp.cpp:709 '//TODO need to fill in for
    classification'); here the grid holds the actual class-one probabilities
    from the noise model.  The plot script references `name`_active_set.dat
    exactly as the reference emits it (gp.cpp:745) even though this branch
    writes the inducing set to `name`_inducing_set.dat (gp.cpp:638) — a
    faithful reference quirk."""
    from gpc_tpu.io.model_io import make_noise_from_stream

    if model.spec.sparse:
        write_unheaded(f"{name}_inducing_set.dat",
                       np.asarray(model.inducing()))
    pos = y[:, 0] == 1.0
    neg = y[:, 0] == -1.0
    unlab = ~(pos | neg)
    for mask, tag in ((pos, "positive"), (neg, "negative"),
                      (unlab, "unlabelled")):
        if mask.any():
            write_unheaded(f"{name}_{tag}.dat",
                           np.hstack([X[mask],
                                      np.zeros((int(mask.sum()), 1))]))
    mins, maxs = X.min(0), X.max(0)
    nx = ny = resolution
    xs = np.linspace(mins[0], maxs[0], nx)
    ys = np.linspace(mins[1], maxs[1], ny)
    XX, YY = np.meshgrid(xs, ys)
    grid = np.column_stack([XX.ravel(), YY.ravel()])
    mu, vs = model.predict(grid)
    noise = make_noise_from_stream(model.noise_type, model.noise_params,
                                   model.spec.output_dim,
                                   getattr(model, "noise_extra", {}))
    ones = np.ones((grid.shape[0], model.spec.output_dim))
    import jax.numpy as jnp
    probs = np.asarray(noise.likelihoods(
        jnp.asarray(model.noise_params), mu, vs, jnp.asarray(ones)))[:, 0]
    probs = probs.reshape(ny, nx)
    with open(f"{name}_prob_matrix.dat", "w") as f:
        f.write("# Prepared plot of model file \n")
        for i in range(ny):
            for j in range(nx):
                f.write(f"{xs[j]:.17e} {ys[i]:.17e} {probs[i, j]:.17e}\n")
            f.write("\n")
    with open(f"{name}_plot.gp", "w") as f:
        f.write("set nosurface\nset contour base\n"
                "set cntrparam levels discrete 0.5\n"
                "set term table # set output type to tables\n"
                f"set out '{name}_decision.dat'\n"
                f'splot "{name}_prob_matrix.dat"\n'
                "set cntrparam levels discrete 0.25, 0.75\n"
                f"set out '{name}_contours.dat'\n"
                f'splot "{name}_prob_matrix.dat"\n'
                "reset\nset term x11\nplot ")
        parts = []
        if pos.any():
            parts.append(f'"{name}_positive.dat" with points ps {point_size}')
        if neg.any():
            parts.append(f'"{name}_negative.dat" with points ps {point_size}')
        parts.append(f'"{name}_active_set.dat" with points ps {point_size * 2}')
        if unlab.any():
            parts.append(f'"{name}_unlabelled.dat" with points ps {point_size}')
        parts.append(f'"{name}_decision.dat" with lines lw {line_width}')
        parts.append(f'"{name}_contours.dat" with lines lw {line_width}')
        f.write(", ".join(parts) + "\npause -1\n")


def gnuplot(cl: CommandLine):
    """Emit plot artifacts (gp.cpp:567-906): 1-D line + ±2σ error bars, 2-D mesh,
    scatter data, active-set points for gaussian noise; probit/ncnm probability
    grid + contour script for classification models; plus the driving script."""
    cl.advance()
    cl.mode = "gnuplot"
    resolution = 80
    point_size, line_width = 2.0, 2.0
    name = "gp"
    model_file = "gp_model"
    while cl.is_flag():
        arg = cl.current()
        if arg in ("-p", "--point-size"):
            point_size = cl.get_double(); cl.advance()
        elif arg in ("-r", "--resolution"):
            resolution = cl.get_int(); cl.advance()
        elif arg in ("-l", "--labels"):
            # accepted-and-unused, as in the reference: gp.cpp:586-588
            # parses labelFileName but nothing ever reads it
            cl.get_string(); cl.advance()
        else:
            raise ExitError(f"Unrecognised flag: {cl.current()}")
    data_file = cl.current()
    if cl.pos + 1 < len(cl.argv):
        model_file = cl.argv[cl.pos + 1]
    if cl.pos + 2 < len(cl.argv):
        name = cl.argv[cl.pos + 2]

    X, y = load_data(data_file, cl.file_format)
    try:
        model = model_io.read_gp(model_file, X=X, y=y)
    except model_io.DataDimensionError:
        raise ExitError("Incorrect dimension of input data.")
    q = model.spec.input_dim
    noise_type = getattr(model, "noise_type", "gaussian")
    # dimension gates, gp.cpp:624-631
    if noise_type != "gaussian" and q != 2:
        raise ExitError("Incorrect number of model inputs.")
    if noise_type == "gaussian" and q > 2:
        raise ExitError("Incorrect number of model inputs.")
    if noise_type in ("probit", "ncnm"):
        _gnuplot_classification(model, X, y, name, resolution, point_size,
                                line_width)
        return
    sigma2 = float(model.noise_params[-1]) if getattr(model, "noise_params", None) is not None else 1e-6

    if model.spec.sparse:
        Xu = model.inducing()
        mu_u, _ = model.predict(Xu)
        write_unheaded(f"{name}_active_set.dat", np.hstack([Xu, np.asarray(mu_u)[:, :1]]))
    write_unheaded(f"{name}_scatter_data.dat", np.hstack([X, y[:, :1]]))

    mins, maxs = X.min(axis=0), X.max(axis=0)
    if q == 2:
        nx = ny = resolution
        xs = np.linspace(mins[0], maxs[0], nx)
        ys = np.linspace(mins[1], maxs[1], ny)
        XX, YY = np.meshgrid(xs, ys)
        grid = np.column_stack([XX.ravel(), YY.ravel()])
        mu, _ = model.predict(grid)
        mu = np.asarray(mu)[:, 0].reshape(ny, nx)
        with open(f"{name}_output_matrix.dat", "w") as f:
            f.write("# Prepared plot of model file \n")
            for i in range(ny):
                for j in range(nx):
                    f.write(f"{xs[j]:.17e} {ys[i]:.17e} {mu[i, j]:.17e}\n")
                f.write("\n")
        with open(f"{name}_plot.gp", "w") as f:
            f.write(f'splot "{name}_output_matrix.dat"  with lines lw {line_width}'
                    f', "{name}_scatter_data.dat" with points ps {point_size}')
            if model.spec.sparse:
                f.write(f', "{name}_active_set.dat" with points ps {point_size}\n')
            f.write("pause -1")
    else:
        overlap = 0.25
        span = maxs[0] - mins[0]
        lo, hi = mins[0] - overlap * span, maxs[0] + overlap * span
        xs = np.linspace(lo, hi, resolution)
        mu, var = model.predict(xs.reshape(-1, 1))
        mu = np.asarray(mu)[:, 0]
        std = np.sqrt(np.asarray(var)[:, 0] + sigma2)
        write_unheaded(f"{name}_line_data.dat", np.column_stack([xs, mu]))
        with open(f"{name}_error_bar_data.dat", "w") as f:
            f.write("# Prepared plot of model file \n")
            for xv, m, s in zip(xs, mu, std):
                f.write(f"{xv:.17e} {m + 2 * s:.17e}\n")
            f.write("\n")
            for xv, m, s in zip(xs, mu, std):
                f.write(f"{xv:.17e} {m - 2 * s:.17e}\n")
        with open(f"{name}_plot.gp", "w") as f:
            f.write(f'plot "{name}_line_data.dat" with lines lw {line_width}'
                    f', "{name}_scatter_data.dat" with points ps {point_size}')
            if model.spec.sparse:
                f.write(f', "{name}_active_set.dat" with points ps {point_size}')
            f.write(f', "{name}_error_bar_data.dat" with lines lw {line_width}\n')
            f.write("pause -1")


COMMANDS = {"learn": learn, "relearn": relearn, "display": display,
            "gnuplot": gnuplot, "test": test_cmd, "predict": predict_cmd,
            "log-likelihood": log_likelihood_cmd}


def main(argv=None):
    from gpc_tpu.cli.common import setup_jax
    setup_jax()
    cl = CommandLine(argv if argv is not None else sys.argv[1:])
    cl.eat_global_flags()
    if not cl.has_more():
        _help()
        raise ExitError("No command provided.")
    np.random.seed(cl.seed % (2 ** 32))
    cmd = cl.current()
    if cmd not in COMMANDS:
        _help()
        raise ExitError(f"Invalid gp command provided: {cmd}")
    try:
        COMMANDS[cmd](cl)
    except FileNotFoundError as e:
        raise ExitError(f"Unable to read file {e.filename}.")
    except ValueError as e:
        raise ExitError(str(e))


if __name__ == "__main__":
    main()
