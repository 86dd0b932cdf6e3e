/* fastxyz: C extension for multi-conformer .xyz parsing/writing.
 *
 * The framework's host ingress path (firecode_tpu/io/xyz.py) is pure Python;
 * for production-scale ensembles (1e5 conformers x 1e2 atoms) tokenizing in
 * Python dominates wall-clock. This extension parses the whole file in one C
 * pass into numpy arrays, and formats frames back out with a tight loop.
 *
 * Exposed functions:
 *   parse(text: str) -> (symbols: list[str], coords: ndarray[B, N, 3],
 *                        comments: list[str])
 *   format(symbols: sequence[str], coords: ndarray[B, N, 3],
 *          titles: sequence[str]) -> str
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <numpy/arrayobject.h>
#include <stdlib.h>
#include <string.h>
#include <ctype.h>

static const char *skip_ws(const char *p, const char *end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
    return p;
}

static const char *next_line(const char *p, const char *end) {
    while (p < end && *p != '\n') p++;
    return p < end ? p + 1 : end;
}

static PyObject *fastxyz_parse(PyObject *self, PyObject *args) {
    const char *text;
    Py_ssize_t text_len;
    if (!PyArg_ParseTuple(args, "s#", &text, &text_len)) return NULL;

    const char *p = text;
    const char *end = text + text_len;

    PyObject *symbols = NULL;   /* list[str], first frame only */
    PyObject *comments = PyList_New(0);
    double *coords = NULL;      /* growable buffer */
    size_t cap = 0, used = 0;
    long natoms = -1;
    long nframes = 0;
    /* first-frame symbol tokens for cross-frame validation */
    char *sym_buf = NULL;
    size_t *sym_off = NULL;     /* natoms + 1 offsets into sym_buf */

    while (p < end) {
        p = skip_ws(p, end);
        if (p >= end || *p == '\n') { if (p < end) p++; continue; }

        /* atom count line */
        char *endptr;
        long n = strtol(p, &endptr, 10);
        if (endptr == p || n <= 0) {
            PyErr_Format(PyExc_ValueError,
                         "fastxyz: expected atom count near byte %ld",
                         (long)(p - text));
            goto fail;
        }
        if (natoms == -1) natoms = n;
        else if (n != natoms) {
            PyErr_SetString(PyExc_ValueError,
                            "fastxyz: frames have differing atom counts");
            goto fail;
        }
        p = next_line(p, end);

        /* comment line */
        {
            const char *cstart = p;
            const char *cend = cstart;
            while (cend < end && *cend != '\n') cend++;
            PyObject *comment = PyUnicode_FromStringAndSize(cstart, cend - cstart);
            if (!comment) goto fail;
            PyList_Append(comments, comment);
            Py_DECREF(comment);
            p = cend < end ? cend + 1 : end;
        }

        /* atom lines */
        int first_frame = (nframes == 0);
        if (first_frame) {
            symbols = PyList_New(0);
            if (!symbols) goto fail;
            sym_buf = (char *)malloc((size_t)natoms * 8 + 8);
            sym_off = (size_t *)malloc(((size_t)natoms + 1) * sizeof(size_t));
            if (!sym_buf || !sym_off) { PyErr_NoMemory(); goto fail; }
            sym_off[0] = 0;
        }
        if (used + (size_t)(3 * natoms) > cap) {
            cap = cap ? cap * 2 : (size_t)(3 * natoms * 64);
            if (used + (size_t)(3 * natoms) > cap) cap = used + 3 * natoms;
            double *nc = (double *)realloc(coords, cap * sizeof(double));
            if (!nc) { PyErr_NoMemory(); goto fail; }
            coords = nc;
        }
        for (long a = 0; a < natoms; a++) {
            p = skip_ws(p, end);
            const char *sym_start = p;
            while (p < end && !isspace((unsigned char)*p)) p++;
            size_t sym_len = (size_t)(p - sym_start);
            if (first_frame) {
                PyObject *sym = PyUnicode_FromStringAndSize(sym_start, sym_len);
                if (!sym) goto fail;
                PyList_Append(symbols, sym);
                Py_DECREF(sym);
                if (sym_len > 7) sym_len = 7;
                memcpy(sym_buf + sym_off[a], sym_start, sym_len);
                sym_off[a + 1] = sym_off[a] + sym_len;
            } else {
                size_t ref_len = sym_off[a + 1] - sym_off[a];
                if (sym_len != ref_len ||
                    memcmp(sym_buf + sym_off[a], sym_start, ref_len) != 0) {
                    PyErr_SetString(PyExc_ValueError,
                                    "fastxyz: all frames in a multi-conformer "
                                    "xyz must share one atom list");
                    goto fail;
                }
            }
            for (int k = 0; k < 3; k++) {
                p = skip_ws(p, end);
                char *num_end;
                double v = strtod(p, &num_end);
                if (num_end == p) {
                    PyErr_Format(PyExc_ValueError,
                                 "fastxyz: bad coordinate in frame %ld atom %ld",
                                 nframes, a);
                    goto fail;
                }
                coords[used++] = v;
                p = num_end;
            }
            p = next_line(p, end);
        }
        nframes++;
    }

    if (nframes == 0) {
        PyErr_SetString(PyExc_ValueError, "fastxyz: empty xyz file");
        goto fail;
    }

    npy_intp dims[3] = {nframes, natoms, 3};
    PyObject *arr = PyArray_SimpleNew(3, dims, NPY_DOUBLE);
    if (!arr) goto fail;
    memcpy(PyArray_DATA((PyArrayObject *)arr), coords,
           (size_t)nframes * natoms * 3 * sizeof(double));
    free(coords);
    free(sym_buf);
    free(sym_off);

    PyObject *result = Py_BuildValue("(NNN)", symbols, arr, comments);
    return result;

fail:
    free(coords);
    free(sym_buf);
    free(sym_off);
    Py_XDECREF(symbols);
    Py_XDECREF(comments);
    return NULL;
}

static PyObject *fastxyz_format(PyObject *self, PyObject *args) {
    PyObject *symbols_obj, *coords_obj, *titles_obj;
    if (!PyArg_ParseTuple(args, "OOO", &symbols_obj, &coords_obj, &titles_obj))
        return NULL;

    PyArrayObject *coords = (PyArrayObject *)PyArray_FROM_OTF(
        coords_obj, NPY_DOUBLE, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED);
    if (!coords) return NULL;
    if (PyArray_NDIM(coords) != 3 || PyArray_DIM(coords, 2) != 3) {
        Py_DECREF(coords);
        PyErr_SetString(PyExc_ValueError, "fastxyz: coords must be [B, N, 3]");
        return NULL;
    }
    npy_intp nframes = PyArray_DIM(coords, 0);
    npy_intp natoms = PyArray_DIM(coords, 1);

    PyObject *symbols = PySequence_Fast(symbols_obj, "symbols must be a sequence");
    if (!symbols) { Py_DECREF(coords); return NULL; }
    PyObject *titles = PySequence_Fast(titles_obj, "titles must be a sequence");
    if (!titles) { Py_DECREF(coords); Py_DECREF(symbols); return NULL; }

    if (PySequence_Fast_GET_SIZE(symbols) != natoms ||
        PySequence_Fast_GET_SIZE(titles) != nframes) {
        PyErr_SetString(PyExc_ValueError,
                        "fastxyz: symbols/titles length mismatch");
        goto fail;
    }

    /* worst case per atom line: 3 symbols + 3 * 17 chars + spacing = 80 */
    size_t cap = (size_t)nframes * ((size_t)natoms * 80 + 256);
    char *buf = (char *)malloc(cap);
    if (!buf) { PyErr_NoMemory(); goto fail; }
    char *w = buf;

    const double *data = (const double *)PyArray_DATA(coords);
    for (npy_intp b = 0; b < nframes; b++) {
        PyObject *title = PySequence_Fast_GET_ITEM(titles, b);
        const char *title_c = PyUnicode_AsUTF8(title);
        if (!title_c) { free(buf); goto fail; }
        w += sprintf(w, "%ld\n%s\n", (long)natoms, title_c);
        for (npy_intp a = 0; a < natoms; a++) {
            PyObject *sym = PySequence_Fast_GET_ITEM(symbols, a);
            const char *sym_c = PyUnicode_AsUTF8(sym);
            if (!sym_c) { free(buf); goto fail; }
            const double *r = data + (b * natoms + a) * 3;
            w += sprintf(w, "%-3s %15.8f %15.8f %15.8f\n",
                         sym_c, r[0], r[1], r[2]);
        }
    }

    PyObject *out = PyUnicode_FromStringAndSize(buf, w - buf);
    free(buf);
    Py_DECREF(coords);
    Py_DECREF(symbols);
    Py_DECREF(titles);
    return out;

fail:
    Py_DECREF(coords);
    Py_DECREF(symbols);
    Py_DECREF(titles);
    return NULL;
}

static PyMethodDef FastxyzMethods[] = {
    {"parse", fastxyz_parse, METH_VARARGS,
     "parse(text) -> (symbols, coords[B,N,3], comments)"},
    {"format", fastxyz_format, METH_VARARGS,
     "format(symbols, coords[B,N,3], titles) -> str"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef fastxyzmodule = {
    PyModuleDef_HEAD_INIT, "_fastxyz",
    "C-accelerated multi-conformer xyz I/O", -1, FastxyzMethods,
};

PyMODINIT_FUNC PyInit__fastxyz(void) {
    import_array();
    return PyModule_Create(&fastxyzmodule);
}
