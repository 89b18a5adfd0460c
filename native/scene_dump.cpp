/*
 * scene_dump: serialize the reference engine's static scene data to JSON.
 *
 * Compiles against the READ-ONLY reference headers (format.h + the
 * scn_*.h initializers) and walks the rt_OBJ trees at runtime, emitting
 * pure data (transforms, surface params, materials, relations, textures)
 * for quadray_tpu/models/scenes/loader.py. This ports the reference's
 * L4 scene *data* — no engine code is reproduced.
 *
 * Build/run: see native/Makefile (dump target).
 */

#include <cstdio>
#include <cstdint>
#include <cmath>
#include <map>
#include <string>
#include <vector>

#include "format.h"

/* test scenes (each in its own namespace) */
#include "scn_test01.h"
#include "scn_test02.h"
#include "scn_test03.h"
#include "scn_test04.h"
#include "scn_test05.h"
#include "scn_test06.h"
#include "scn_test07.h"
#include "scn_test08.h"
#include "scn_test09.h"
#include "scn_test10.h"
#include "scn_test11.h"
#include "scn_test12.h"
#include "scn_test13.h"
#include "scn_test14.h"
#include "scn_test15.h"
#include "scn_test16.h"
#include "scn_test17.h"
#include "scn_test18.h"
/* demo scenes */
#include "scn_demo01.h"
#include "scn_demo02.h"
#include "scn_demo03.h"

static FILE *out;
static std::map<rt_MATERIAL *, int> mat_ids;
static std::vector<rt_MATERIAL *> mats;

static double clampf(float v)
{
    if (std::isinf(v)) return v > 0 ? 1e38 : -1e38;
    return (double)v;
}

static void emit_vec(const rt_real *v, int n)
{
    fprintf(out, "[");
    for (int i = 0; i < n; i++)
        fprintf(out, "%s%.9g", i ? "," : "", clampf(v[i]));
    fprintf(out, "]");
}

static int mat_id(rt_MATERIAL *m)
{
    if (m == RT_NULL) return -1;
    auto it = mat_ids.find(m);
    if (it != mat_ids.end()) return it->second;
    int id = (int)mats.size();
    mat_ids[m] = id;
    mats.push_back(m);
    return id;
}

static void emit_side(const rt_SIDE *sd)
{
    fprintf(out, "{\"scl\":");
    emit_vec(sd->scl, 2);
    fprintf(out, ",\"rot\":%.9g,\"pos\":", clampf(sd->rot));
    emit_vec(sd->pos, 2);
    fprintf(out, ",\"mat\":%d}", mat_id(sd->pmat));
}

static void emit_surface(rt_si32 tag, void *pobj)
{
    rt_SURFACE *s = (rt_SURFACE *)pobj;
    static const char *names[] = {
        "plane", "cylinder", "sphere", "cone", "paraboloid",
        "hyperboloid", "paracylinder", "hypercylinder", "hyperparaboloid"};
    fprintf(out, "\"type\":\"%s\",\"min\":", names[tag]);
    emit_vec(s->min, 3);
    fprintf(out, ",\"max\":");
    emit_vec(s->max, 3);
    fprintf(out, ",\"side_outer\":");
    emit_side(&s->side_outer);
    fprintf(out, ",\"side_inner\":");
    emit_side(&s->side_inner);
    switch (tag)
    {
        case RT_TAG_CYLINDER:
        fprintf(out, ",\"rad\":%.9g", clampf(((rt_CYLINDER *)pobj)->rad));
        break;
        case RT_TAG_SPHERE:
        fprintf(out, ",\"rad\":%.9g", clampf(((rt_SPHERE *)pobj)->rad));
        break;
        case RT_TAG_CONE:
        fprintf(out, ",\"rat\":%.9g", clampf(((rt_CONE *)pobj)->rat));
        break;
        case RT_TAG_PARABOLOID:
        fprintf(out, ",\"par\":%.9g", clampf(((rt_PARABOLOID *)pobj)->par));
        break;
        case RT_TAG_HYPERBOLOID:
        fprintf(out, ",\"rat\":%.9g,\"hyp\":%.9g",
                clampf(((rt_HYPERBOLOID *)pobj)->rat),
                clampf(((rt_HYPERBOLOID *)pobj)->hyp));
        break;
        case RT_TAG_PARACYLINDER:
        fprintf(out, ",\"par\":%.9g", clampf(((rt_PARACYLINDER *)pobj)->par));
        break;
        case RT_TAG_HYPERCYLINDER:
        fprintf(out, ",\"rat\":%.9g,\"hyp\":%.9g",
                clampf(((rt_HYPERCYLINDER *)pobj)->rat),
                clampf(((rt_HYPERCYLINDER *)pobj)->hyp));
        break;
        case RT_TAG_HYPERPARABOLOID:
        fprintf(out, ",\"pr1\":%.9g,\"pr2\":%.9g",
                clampf(((rt_HYPERPARABOLOID *)pobj)->pr1),
                clampf(((rt_HYPERPARABOLOID *)pobj)->pr2));
        break;
    }
}

static void emit_object(rt_OBJECT *ob);

static void emit_array(rt_OBJECT *arr, rt_si32 num,
                       rt_RELATION *rel, rt_si32 rel_num)
{
    fprintf(out, "\"type\":\"array\",\"objects\":[");
    for (rt_si32 i = 0; i < num; i++)
    {
        if (i) fprintf(out, ",");
        emit_object(&arr[i]);
    }
    fprintf(out, "],\"relations\":[");
    for (rt_si32 i = 0; i < rel_num; i++)
    {
        if (i) fprintf(out, ",");
        fprintf(out, "[%d,%d,%d]", rel[i].obj1, rel[i].rel, rel[i].obj2);
    }
    fprintf(out, "]");
}

static void emit_object(rt_OBJECT *ob)
{
    fprintf(out, "{\"trm\":{\"scl\":");
    emit_vec(ob->trm.scl, 3);
    fprintf(out, ",\"rot\":");
    emit_vec(ob->trm.rot, 3);
    fprintf(out, ",\"pos\":");
    emit_vec(ob->trm.pos, 3);
    fprintf(out, "},\"anim\":%d,", ob->f_anim != RT_NULL ? 1 : 0);

    rt_si32 tag = ob->obj.tag;
    if (tag == RT_TAG_ARRAY)
    {
        emit_array((rt_OBJECT *)ob->obj.pobj, ob->obj.obj_num,
                   ob->obj.prel, ob->obj.rel_num);
    }
    else if (tag == RT_TAG_CAMERA)
    {
        rt_CAMERA *c = (rt_CAMERA *)ob->obj.pobj;
        fprintf(out, "\"type\":\"camera\",\"col\":%u,\"amb\":%.9g,"
                "\"pov\":%.9g,\"dps\":",
                c->col.val, clampf(c->lum[0]), clampf(c->vpt[0]));
        emit_vec(c->dps, 3);
        fprintf(out, ",\"drt\":");
        emit_vec(c->drt, 3);
    }
    else if (tag == RT_TAG_LIGHT)
    {
        rt_LIGHT *l = (rt_LIGHT *)ob->obj.pobj;
        fprintf(out, "\"type\":\"light\",\"col\":%u,\"amb\":%.9g,"
                "\"src\":%.9g,\"rng\":%.9g,\"cnt\":%.9g,\"lnr\":%.9g,"
                "\"qdr\":%.9g",
                l->col.val, clampf(l->lum[0]), clampf(l->lum[1]),
                clampf(l->atn[0]), clampf(l->atn[1]), clampf(l->atn[2]),
                clampf(l->atn[3]));
    }
    else
    {
        emit_surface(tag, ob->obj.pobj);
        fprintf(out, ",\"mat_outer\":%d,\"mat_inner\":%d",
                mat_id(ob->obj.pmat_outer), mat_id(ob->obj.pmat_inner));
    }
    fprintf(out, "}");
}

static void emit_materials()
{
    fprintf(out, "\"materials\":[");
    /* mats grows while we emit (side materials of clip templates are all
     * reached before this point, since the tree walk resolves every side) */
    for (size_t i = 0; i < mats.size(); i++)
    {
        rt_MATERIAL *m = mats[i];
        if (i) fprintf(out, ",");
        rt_TEX *tx = &m->tex;
        fprintf(out, "{\"tag\":%d,\"color\":%u,\"dff\":%.9g,\"spc\":%.9g,"
                "\"pow\":%.9g,\"rfl\":%.9g,\"trn\":%.9g,\"rfr\":%.9g,"
                "\"ext\":%.9g",
                m->tag, tx->col.val,
                clampf(m->lgt[0]), clampf(m->lgt[1]), clampf(m->lgt[2]),
                clampf(m->prp[0]), clampf(m->prp[1]), clampf(m->prp[2]),
                clampf(m->prp[3]));
        if (tx->x_dim > 0 && tx->y_dim > 0 && tx->ptex != RT_NULL)
        {
            fprintf(out, ",\"tex_w\":%d,\"tex_h\":%d,\"tex\":[",
                    tx->x_dim, tx->y_dim);
            rt_ui32 *px = (rt_ui32 *)tx->ptex;
            for (rt_si32 p = 0; p < tx->x_dim * tx->y_dim; p++)
                fprintf(out, "%s%u", p ? "," : "", px[p]);
            fprintf(out, "]");
        }
        else if (tx->ptex != RT_NULL && tx->x_dim == 0)
        {
            fprintf(out, ",\"tex_file\":\"%s\"", (const char *)tx->ptex);
        }
        fprintf(out, "}");
    }
    fprintf(out, "]");
}

static void dump_scene(const char *name, rt_SCENE *sc)
{
    char path[256];
    snprintf(path, sizeof(path), "%s.json", name);
    out = fopen(path, "w");
    mat_ids.clear();
    mats.clear();
    fprintf(out, "{\"opts\":%u,\"root\":{", sc->opts);
    emit_array((rt_OBJECT *)sc->root.pobj, sc->root.obj_num,
               sc->root.prel, sc->root.rel_num);
    fprintf(out, "},");
    emit_materials();
    fprintf(out, "}\n");
    fclose(out);
    printf("wrote %s (%d materials)\n", path, (int)mats.size());
}

int main()
{
    dump_scene("test01", &scn_test01::sc_root);
    dump_scene("test02", &scn_test02::sc_root);
    dump_scene("test03", &scn_test03::sc_root);
    dump_scene("test04", &scn_test04::sc_root);
    dump_scene("test05", &scn_test05::sc_root);
    dump_scene("test06", &scn_test06::sc_root);
    dump_scene("test07", &scn_test07::sc_root);
    dump_scene("test08", &scn_test08::sc_root);
    dump_scene("test09", &scn_test09::sc_root);
    dump_scene("test10", &scn_test10::sc_root);
    dump_scene("test11", &scn_test11::sc_root);
    dump_scene("test12", &scn_test12::sc_root);
    dump_scene("test13", &scn_test13::sc_root);
    dump_scene("test14", &scn_test14::sc_root);
    dump_scene("test15", &scn_test15::sc_root);
    dump_scene("test16", &scn_test16::sc_root);
    dump_scene("test17", &scn_test17::sc_root);
    dump_scene("test18", &scn_test18::sc_root);
    dump_scene("demo01", &scn_demo01::sc_root);
    dump_scene("demo02", &scn_demo02::sc_root);
    dump_scene("demo03", &scn_demo03::sc_root);
    return 0;
}
