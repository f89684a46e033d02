module @_grid_entry {
  func.func @main(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32, %arg4: memref<1x4x512x128xbf16, #tpu.memory_space<vmem>>, %arg5: memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, %arg6: memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, %arg7: memref<1x4x512x128xbf16, #tpu.memory_space<vmem>>, %arg8: memref<2048x128xf32, #tpu.memory_space<vmem>>, %arg9: memref<2048x128xf32, #tpu.memory_space<vmem>>, %arg10: memref<2048x128xf32, #tpu.memory_space<vmem>>) attributes {dimension_semantics = [#tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<arbitrary>], iteration_bounds = array<i64: 1, 1, 4, 1>, scalar_prefetch = 0 : i64, scratch_operands = 3 : i64, window_params = [{transform_indices = @transform_0, window_bounds = array<i64: 1, 4, 512, 128>}, {transform_indices = @transform_1, window_bounds = array<i64: 1, 4, 2048, 128>}, {transform_indices = @transform_2, window_bounds = array<i64: 1, 4, 2048, 128>}, {transform_indices = @transform_3, window_bounds = array<i64: 1, 4, 512, 128>}]} {
    %c1792_i32 = arith.constant 1792 : i32
    %cst = arith.constant dense<0.000000e+00> : vector<256x1xf32>
    %cst_0 = arith.constant dense<-1.000000e+30> : vector<256x1024xf32>
    %cst_1 = arith.constant dense<0.127517432> : vector<512x128xf32>
    %c2047_i32 = arith.constant 2047 : i32
    %c1792 = arith.constant 1792 : index
    %c1536 = arith.constant 1536 : index
    %c3 = arith.constant 3 : index
    %c1280 = arith.constant 1280 : index
    %c1024 = arith.constant 1024 : index
    %c2 = arith.constant 2 : index
    %c768 = arith.constant 768 : index
    %c512 = arith.constant 512 : index
    %c1 = arith.constant 1 : index
    %c256 = arith.constant 256 : index
    %c1024_i32 = arith.constant 1024 : i32
    %cst_2 = arith.constant dense<0.000000e+00> : vector<256x128xf32>
    %cst_3 = arith.constant dense<0.000000e+00> : vector<256xf32>
    %cst_4 = arith.constant dense<0xFF800000> : vector<256xf32>
    %cst_5 = arith.constant dense<0.000000e+00> : vector<256x1024xf32>
    %c0 = arith.constant 0 : index
    %c1536_i32 = arith.constant 1536 : i32
    %c512_i32 = arith.constant 512 : i32
    %c2048_i32 = arith.constant 2048 : i32
    %c0_i32 = arith.constant 0 : i32
    %0 = arith.cmpi eq, %arg3, %c0_i32 : i32
    %1 = arith.cmpi eq, %arg3, %c0_i32 : i32
    %2 = arith.muli %arg3, %c2048_i32 : i32
    %3 = arith.muli %arg2, %c512_i32 : i32
    %4 = arith.addi %3, %c1536_i32 : i32
    %5 = arith.addi %3, %c2047_i32 : i32
    %6 = arith.cmpi sle, %2, %5 : i32
    scf.if %6 {
      %7 = vector.load %arg4[%c0, %c0, %c0, %c0] : memref<1x4x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
      %8 = vector.shape_cast %7 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
      %9 = arith.extf %8 : vector<512x128xbf16> to vector<512x128xf32>
      %10 = arith.mulf %9, %cst_1 : vector<512x128xf32>
      %11 = arith.truncf %10 : vector<512x128xf32> to vector<512x128xbf16>
      %12 = vector.load %arg5[%c0, %c0, %c0, %c0] : memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x2048x128xbf16>
      %13 = vector.shape_cast %12 : vector<1x1x2048x128xbf16> to vector<2048x128xbf16>
      %14 = vector.load %arg6[%c0, %c0, %c0, %c0] : memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x2048x128xbf16>
      %15 = vector.shape_cast %14 : vector<1x1x2048x128xbf16> to vector<2048x128xbf16>
      %16 = vector.extract_strided_slice %11 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
      scf.if %0 {
        %63 = vector.extract_strided_slice %13 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %64 = vector.extract_strided_slice %15 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %65 = tpu.matmul %16, %63, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %66 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %67 = vector.broadcast %4 : i32 to vector<256x1024xi32>
        %68 = arith.addi %67, %66 : vector<256x1024xi32>
        %69 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %70 = vector.broadcast %2 : i32 to vector<256x1024xi32>
        %71 = arith.addi %70, %69 : vector<256x1024xi32>
        %72 = arith.cmpi sge, %68, %71 : vector<256x1024xi32>
        %73 = arith.select %72, %65, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %74 = vector.multi_reduction <maximumf>, %73, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %75 = vector.shape_cast %74 : vector<256xf32> to vector<256x1xf32>
        %76 = vector.broadcast %75 : vector<256x1xf32> to vector<256x1024xf32>
        %77 = arith.subf %73, %76 : vector<256x1024xf32>
        %78 = math.exp2 %77 : vector<256x1024xf32>
        %79 = arith.truncf %78 : vector<256x1024xf32> to vector<256x1024xbf16>
        %80 = vector.multi_reduction <add>, %78, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %81 = vector.shape_cast %80 : vector<256xf32> to vector<256x1xf32>
        %82 = tpu.matmul %79, %64, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %83 = vector.extract_strided_slice %13 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %84 = vector.extract_strided_slice %15 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %85 = tpu.matmul %16, %83, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %86 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %87 = vector.broadcast %4 : i32 to vector<256x1024xi32>
        %88 = arith.addi %87, %86 : vector<256x1024xi32>
        %89 = arith.addi %2, %c1024_i32 : i32
        %90 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %91 = vector.broadcast %89 : i32 to vector<256x1024xi32>
        %92 = arith.addi %91, %90 : vector<256x1024xi32>
        %93 = arith.cmpi sge, %88, %92 : vector<256x1024xi32>
        %94 = arith.select %93, %85, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %95 = vector.multi_reduction <maximumf>, %94, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %96 = vector.shape_cast %95 : vector<256xf32> to vector<256x1xf32>
        %97 = vector.broadcast %96 : vector<256x1xf32> to vector<256x1024xf32>
        %98 = arith.subf %94, %97 : vector<256x1024xf32>
        %99 = math.exp2 %98 : vector<256x1024xf32>
        %100 = arith.truncf %99 : vector<256x1024xf32> to vector<256x1024xbf16>
        %101 = vector.multi_reduction <add>, %99, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %102 = vector.shape_cast %101 : vector<256xf32> to vector<256x1xf32>
        %103 = tpu.matmul %100, %84, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %104 = arith.maximumf %75, %96 : vector<256x1xf32>
        %105 = vector.broadcast %104 : vector<256x1xf32> to vector<256x128xf32>
        %106 = arith.subf %75, %104 : vector<256x1xf32>
        %107 = math.exp2 %106 : vector<256x1xf32>
        %108 = arith.mulf %81, %107 : vector<256x1xf32>
        %109 = arith.addf %108, %cst : vector<256x1xf32>
        %110 = vector.broadcast %107 : vector<256x1xf32> to vector<256x128xf32>
        %111 = arith.mulf %82, %110 : vector<256x128xf32>
        %112 = arith.addf %111, %cst_2 : vector<256x128xf32>
        %113 = arith.subf %96, %104 : vector<256x1xf32>
        %114 = math.exp2 %113 : vector<256x1xf32>
        %115 = arith.mulf %102, %114 : vector<256x1xf32>
        %116 = arith.addf %109, %115 : vector<256x1xf32>
        %117 = vector.broadcast %114 : vector<256x1xf32> to vector<256x128xf32>
        %118 = arith.mulf %103, %117 : vector<256x128xf32>
        %119 = arith.addf %112, %118 : vector<256x128xf32>
        %120 = vector.broadcast %116 : vector<256x1xf32> to vector<256x128xf32>
        tpu.vector_store %arg9[%c0, %c0], %105 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg10[%c0, %c0], %120 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg8[%c0, %c0], %119 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      }
      %17 = arith.cmpi ne, %arg3, %c0_i32 : i32
      scf.if %17 {
        %63 = vector.load %arg9[%c0, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %64 = vector.load %arg10[%c0, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %65 = vector.load %arg8[%c0, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %66 = vector.extract_strided_slice %13 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %67 = vector.extract_strided_slice %15 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %68 = tpu.matmul %16, %66, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %69 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %70 = vector.broadcast %4 : i32 to vector<256x1024xi32>
        %71 = arith.addi %70, %69 : vector<256x1024xi32>
        %72 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %73 = vector.broadcast %2 : i32 to vector<256x1024xi32>
        %74 = arith.addi %73, %72 : vector<256x1024xi32>
        %75 = arith.cmpi sge, %71, %74 : vector<256x1024xi32>
        %76 = arith.select %75, %68, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %77 = vector.multi_reduction <maximumf>, %76, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %78 = vector.shape_cast %77 : vector<256xf32> to vector<256x1xf32>
        %79 = vector.broadcast %78 : vector<256x1xf32> to vector<256x1024xf32>
        %80 = arith.subf %76, %79 : vector<256x1024xf32>
        %81 = math.exp2 %80 : vector<256x1024xf32>
        %82 = arith.truncf %81 : vector<256x1024xf32> to vector<256x1024xbf16>
        %83 = vector.multi_reduction <add>, %81, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %84 = vector.shape_cast %83 : vector<256xf32> to vector<256x1xf32>
        %85 = tpu.matmul %82, %67, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %86 = vector.extract_strided_slice %13 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %87 = vector.extract_strided_slice %15 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %88 = tpu.matmul %16, %86, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %89 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %90 = vector.broadcast %4 : i32 to vector<256x1024xi32>
        %91 = arith.addi %90, %89 : vector<256x1024xi32>
        %92 = arith.addi %2, %c1024_i32 : i32
        %93 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %94 = vector.broadcast %92 : i32 to vector<256x1024xi32>
        %95 = arith.addi %94, %93 : vector<256x1024xi32>
        %96 = arith.cmpi sge, %91, %95 : vector<256x1024xi32>
        %97 = arith.select %96, %88, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %98 = vector.multi_reduction <maximumf>, %97, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %99 = vector.shape_cast %98 : vector<256xf32> to vector<256x1xf32>
        %100 = vector.broadcast %99 : vector<256x1xf32> to vector<256x1024xf32>
        %101 = arith.subf %97, %100 : vector<256x1024xf32>
        %102 = math.exp2 %101 : vector<256x1024xf32>
        %103 = arith.truncf %102 : vector<256x1024xf32> to vector<256x1024xbf16>
        %104 = vector.multi_reduction <add>, %102, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %105 = vector.shape_cast %104 : vector<256xf32> to vector<256x1xf32>
        %106 = tpu.matmul %103, %87, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %107 = arith.maximumf %78, %99 : vector<256x1xf32>
        %108 = vector.broadcast %107 : vector<256x1xf32> to vector<256x128xf32>
        %109 = arith.maximumf %63, %108 : vector<256x128xf32>
        %110 = vector.extract_strided_slice %109 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
        %111 = arith.subf %63, %109 : vector<256x128xf32>
        %112 = math.exp2 %111 : vector<256x128xf32>
        %113 = arith.subf %78, %110 : vector<256x1xf32>
        %114 = math.exp2 %113 : vector<256x1xf32>
        %115 = arith.mulf %84, %114 : vector<256x1xf32>
        %116 = arith.addf %115, %cst : vector<256x1xf32>
        %117 = vector.broadcast %114 : vector<256x1xf32> to vector<256x128xf32>
        %118 = arith.mulf %85, %117 : vector<256x128xf32>
        %119 = arith.addf %118, %cst_2 : vector<256x128xf32>
        %120 = arith.subf %99, %110 : vector<256x1xf32>
        %121 = math.exp2 %120 : vector<256x1xf32>
        %122 = arith.mulf %105, %121 : vector<256x1xf32>
        %123 = arith.addf %116, %122 : vector<256x1xf32>
        %124 = vector.broadcast %121 : vector<256x1xf32> to vector<256x128xf32>
        %125 = arith.mulf %106, %124 : vector<256x128xf32>
        %126 = arith.addf %119, %125 : vector<256x128xf32>
        %127 = arith.mulf %64, %112 : vector<256x128xf32>
        %128 = vector.broadcast %123 : vector<256x1xf32> to vector<256x128xf32>
        %129 = arith.addf %127, %128 : vector<256x128xf32>
        %130 = vector.extract_strided_slice %112 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
        %131 = vector.broadcast %130 : vector<256x1xf32> to vector<256x128xf32>
        %132 = arith.mulf %65, %131 : vector<256x128xf32>
        %133 = arith.addf %132, %126 : vector<256x128xf32>
        tpu.vector_store %arg9[%c0, %c0], %109 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg10[%c0, %c0], %129 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg8[%c0, %c0], %133 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      }
      %18 = vector.extract_strided_slice %11 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
      %19 = arith.addi %3, %c1792_i32 : i32
      scf.if %0 {
        %63 = vector.extract_strided_slice %13 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %64 = vector.extract_strided_slice %15 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %65 = tpu.matmul %18, %63, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %66 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %67 = vector.broadcast %19 : i32 to vector<256x1024xi32>
        %68 = arith.addi %67, %66 : vector<256x1024xi32>
        %69 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %70 = vector.broadcast %2 : i32 to vector<256x1024xi32>
        %71 = arith.addi %70, %69 : vector<256x1024xi32>
        %72 = arith.cmpi sge, %68, %71 : vector<256x1024xi32>
        %73 = arith.select %72, %65, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %74 = vector.multi_reduction <maximumf>, %73, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %75 = vector.shape_cast %74 : vector<256xf32> to vector<256x1xf32>
        %76 = vector.broadcast %75 : vector<256x1xf32> to vector<256x1024xf32>
        %77 = arith.subf %73, %76 : vector<256x1024xf32>
        %78 = math.exp2 %77 : vector<256x1024xf32>
        %79 = arith.truncf %78 : vector<256x1024xf32> to vector<256x1024xbf16>
        %80 = vector.multi_reduction <add>, %78, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %81 = vector.shape_cast %80 : vector<256xf32> to vector<256x1xf32>
        %82 = tpu.matmul %79, %64, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %83 = vector.extract_strided_slice %13 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %84 = vector.extract_strided_slice %15 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %85 = tpu.matmul %18, %83, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %86 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %87 = vector.broadcast %19 : i32 to vector<256x1024xi32>
        %88 = arith.addi %87, %86 : vector<256x1024xi32>
        %89 = arith.addi %2, %c1024_i32 : i32
        %90 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %91 = vector.broadcast %89 : i32 to vector<256x1024xi32>
        %92 = arith.addi %91, %90 : vector<256x1024xi32>
        %93 = arith.cmpi sge, %88, %92 : vector<256x1024xi32>
        %94 = arith.select %93, %85, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %95 = vector.multi_reduction <maximumf>, %94, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %96 = vector.shape_cast %95 : vector<256xf32> to vector<256x1xf32>
        %97 = vector.broadcast %96 : vector<256x1xf32> to vector<256x1024xf32>
        %98 = arith.subf %94, %97 : vector<256x1024xf32>
        %99 = math.exp2 %98 : vector<256x1024xf32>
        %100 = arith.truncf %99 : vector<256x1024xf32> to vector<256x1024xbf16>
        %101 = vector.multi_reduction <add>, %99, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %102 = vector.shape_cast %101 : vector<256xf32> to vector<256x1xf32>
        %103 = tpu.matmul %100, %84, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %104 = arith.maximumf %75, %96 : vector<256x1xf32>
        %105 = vector.broadcast %104 : vector<256x1xf32> to vector<256x128xf32>
        %106 = arith.subf %75, %104 : vector<256x1xf32>
        %107 = math.exp2 %106 : vector<256x1xf32>
        %108 = arith.mulf %81, %107 : vector<256x1xf32>
        %109 = arith.addf %108, %cst : vector<256x1xf32>
        %110 = vector.broadcast %107 : vector<256x1xf32> to vector<256x128xf32>
        %111 = arith.mulf %82, %110 : vector<256x128xf32>
        %112 = arith.addf %111, %cst_2 : vector<256x128xf32>
        %113 = arith.subf %96, %104 : vector<256x1xf32>
        %114 = math.exp2 %113 : vector<256x1xf32>
        %115 = arith.mulf %102, %114 : vector<256x1xf32>
        %116 = arith.addf %109, %115 : vector<256x1xf32>
        %117 = vector.broadcast %114 : vector<256x1xf32> to vector<256x128xf32>
        %118 = arith.mulf %103, %117 : vector<256x128xf32>
        %119 = arith.addf %112, %118 : vector<256x128xf32>
        %120 = vector.broadcast %116 : vector<256x1xf32> to vector<256x128xf32>
        tpu.vector_store %arg9[%c256, %c0], %105 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg10[%c256, %c0], %120 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg8[%c256, %c0], %119 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      }
      %20 = arith.cmpi ne, %arg3, %c0_i32 : i32
      scf.if %20 {
        %63 = vector.load %arg9[%c256, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %64 = vector.load %arg10[%c256, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %65 = vector.load %arg8[%c256, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %66 = vector.extract_strided_slice %13 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %67 = vector.extract_strided_slice %15 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %68 = tpu.matmul %18, %66, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %69 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %70 = vector.broadcast %19 : i32 to vector<256x1024xi32>
        %71 = arith.addi %70, %69 : vector<256x1024xi32>
        %72 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %73 = vector.broadcast %2 : i32 to vector<256x1024xi32>
        %74 = arith.addi %73, %72 : vector<256x1024xi32>
        %75 = arith.cmpi sge, %71, %74 : vector<256x1024xi32>
        %76 = arith.select %75, %68, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %77 = vector.multi_reduction <maximumf>, %76, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %78 = vector.shape_cast %77 : vector<256xf32> to vector<256x1xf32>
        %79 = vector.broadcast %78 : vector<256x1xf32> to vector<256x1024xf32>
        %80 = arith.subf %76, %79 : vector<256x1024xf32>
        %81 = math.exp2 %80 : vector<256x1024xf32>
        %82 = arith.truncf %81 : vector<256x1024xf32> to vector<256x1024xbf16>
        %83 = vector.multi_reduction <add>, %81, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %84 = vector.shape_cast %83 : vector<256xf32> to vector<256x1xf32>
        %85 = tpu.matmul %82, %67, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %86 = vector.extract_strided_slice %13 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %87 = vector.extract_strided_slice %15 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %88 = tpu.matmul %18, %86, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %89 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %90 = vector.broadcast %19 : i32 to vector<256x1024xi32>
        %91 = arith.addi %90, %89 : vector<256x1024xi32>
        %92 = arith.addi %2, %c1024_i32 : i32
        %93 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %94 = vector.broadcast %92 : i32 to vector<256x1024xi32>
        %95 = arith.addi %94, %93 : vector<256x1024xi32>
        %96 = arith.cmpi sge, %91, %95 : vector<256x1024xi32>
        %97 = arith.select %96, %88, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %98 = vector.multi_reduction <maximumf>, %97, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %99 = vector.shape_cast %98 : vector<256xf32> to vector<256x1xf32>
        %100 = vector.broadcast %99 : vector<256x1xf32> to vector<256x1024xf32>
        %101 = arith.subf %97, %100 : vector<256x1024xf32>
        %102 = math.exp2 %101 : vector<256x1024xf32>
        %103 = arith.truncf %102 : vector<256x1024xf32> to vector<256x1024xbf16>
        %104 = vector.multi_reduction <add>, %102, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %105 = vector.shape_cast %104 : vector<256xf32> to vector<256x1xf32>
        %106 = tpu.matmul %103, %87, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %107 = arith.maximumf %78, %99 : vector<256x1xf32>
        %108 = vector.broadcast %107 : vector<256x1xf32> to vector<256x128xf32>
        %109 = arith.maximumf %63, %108 : vector<256x128xf32>
        %110 = vector.extract_strided_slice %109 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
        %111 = arith.subf %63, %109 : vector<256x128xf32>
        %112 = math.exp2 %111 : vector<256x128xf32>
        %113 = arith.subf %78, %110 : vector<256x1xf32>
        %114 = math.exp2 %113 : vector<256x1xf32>
        %115 = arith.mulf %84, %114 : vector<256x1xf32>
        %116 = arith.addf %115, %cst : vector<256x1xf32>
        %117 = vector.broadcast %114 : vector<256x1xf32> to vector<256x128xf32>
        %118 = arith.mulf %85, %117 : vector<256x128xf32>
        %119 = arith.addf %118, %cst_2 : vector<256x128xf32>
        %120 = arith.subf %99, %110 : vector<256x1xf32>
        %121 = math.exp2 %120 : vector<256x1xf32>
        %122 = arith.mulf %105, %121 : vector<256x1xf32>
        %123 = arith.addf %116, %122 : vector<256x1xf32>
        %124 = vector.broadcast %121 : vector<256x1xf32> to vector<256x128xf32>
        %125 = arith.mulf %106, %124 : vector<256x128xf32>
        %126 = arith.addf %119, %125 : vector<256x128xf32>
        %127 = arith.mulf %64, %112 : vector<256x128xf32>
        %128 = vector.broadcast %123 : vector<256x1xf32> to vector<256x128xf32>
        %129 = arith.addf %127, %128 : vector<256x128xf32>
        %130 = vector.extract_strided_slice %112 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
        %131 = vector.broadcast %130 : vector<256x1xf32> to vector<256x128xf32>
        %132 = arith.mulf %65, %131 : vector<256x128xf32>
        %133 = arith.addf %132, %126 : vector<256x128xf32>
        tpu.vector_store %arg9[%c256, %c0], %109 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg10[%c256, %c0], %129 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg8[%c256, %c0], %133 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      }
      %21 = vector.load %arg4[%c0, %c1, %c0, %c0] : memref<1x4x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
      %22 = vector.shape_cast %21 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
      %23 = arith.extf %22 : vector<512x128xbf16> to vector<512x128xf32>
      %24 = arith.mulf %23, %cst_1 : vector<512x128xf32>
      %25 = arith.truncf %24 : vector<512x128xf32> to vector<512x128xbf16>
      %26 = vector.load %arg5[%c0, %c1, %c0, %c0] : memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x2048x128xbf16>
      %27 = vector.shape_cast %26 : vector<1x1x2048x128xbf16> to vector<2048x128xbf16>
      %28 = vector.load %arg6[%c0, %c1, %c0, %c0] : memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x2048x128xbf16>
      %29 = vector.shape_cast %28 : vector<1x1x2048x128xbf16> to vector<2048x128xbf16>
      %30 = vector.extract_strided_slice %25 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
      scf.if %0 {
        %63 = vector.extract_strided_slice %27 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %64 = vector.extract_strided_slice %29 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %65 = tpu.matmul %30, %63, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %66 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %67 = vector.broadcast %4 : i32 to vector<256x1024xi32>
        %68 = arith.addi %67, %66 : vector<256x1024xi32>
        %69 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %70 = vector.broadcast %2 : i32 to vector<256x1024xi32>
        %71 = arith.addi %70, %69 : vector<256x1024xi32>
        %72 = arith.cmpi sge, %68, %71 : vector<256x1024xi32>
        %73 = arith.select %72, %65, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %74 = vector.multi_reduction <maximumf>, %73, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %75 = vector.shape_cast %74 : vector<256xf32> to vector<256x1xf32>
        %76 = vector.broadcast %75 : vector<256x1xf32> to vector<256x1024xf32>
        %77 = arith.subf %73, %76 : vector<256x1024xf32>
        %78 = math.exp2 %77 : vector<256x1024xf32>
        %79 = arith.truncf %78 : vector<256x1024xf32> to vector<256x1024xbf16>
        %80 = vector.multi_reduction <add>, %78, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %81 = vector.shape_cast %80 : vector<256xf32> to vector<256x1xf32>
        %82 = tpu.matmul %79, %64, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %83 = vector.extract_strided_slice %27 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %84 = vector.extract_strided_slice %29 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %85 = tpu.matmul %30, %83, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %86 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %87 = vector.broadcast %4 : i32 to vector<256x1024xi32>
        %88 = arith.addi %87, %86 : vector<256x1024xi32>
        %89 = arith.addi %2, %c1024_i32 : i32
        %90 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %91 = vector.broadcast %89 : i32 to vector<256x1024xi32>
        %92 = arith.addi %91, %90 : vector<256x1024xi32>
        %93 = arith.cmpi sge, %88, %92 : vector<256x1024xi32>
        %94 = arith.select %93, %85, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %95 = vector.multi_reduction <maximumf>, %94, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %96 = vector.shape_cast %95 : vector<256xf32> to vector<256x1xf32>
        %97 = vector.broadcast %96 : vector<256x1xf32> to vector<256x1024xf32>
        %98 = arith.subf %94, %97 : vector<256x1024xf32>
        %99 = math.exp2 %98 : vector<256x1024xf32>
        %100 = arith.truncf %99 : vector<256x1024xf32> to vector<256x1024xbf16>
        %101 = vector.multi_reduction <add>, %99, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %102 = vector.shape_cast %101 : vector<256xf32> to vector<256x1xf32>
        %103 = tpu.matmul %100, %84, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %104 = arith.maximumf %75, %96 : vector<256x1xf32>
        %105 = vector.broadcast %104 : vector<256x1xf32> to vector<256x128xf32>
        %106 = arith.subf %75, %104 : vector<256x1xf32>
        %107 = math.exp2 %106 : vector<256x1xf32>
        %108 = arith.mulf %81, %107 : vector<256x1xf32>
        %109 = arith.addf %108, %cst : vector<256x1xf32>
        %110 = vector.broadcast %107 : vector<256x1xf32> to vector<256x128xf32>
        %111 = arith.mulf %82, %110 : vector<256x128xf32>
        %112 = arith.addf %111, %cst_2 : vector<256x128xf32>
        %113 = arith.subf %96, %104 : vector<256x1xf32>
        %114 = math.exp2 %113 : vector<256x1xf32>
        %115 = arith.mulf %102, %114 : vector<256x1xf32>
        %116 = arith.addf %109, %115 : vector<256x1xf32>
        %117 = vector.broadcast %114 : vector<256x1xf32> to vector<256x128xf32>
        %118 = arith.mulf %103, %117 : vector<256x128xf32>
        %119 = arith.addf %112, %118 : vector<256x128xf32>
        %120 = vector.broadcast %116 : vector<256x1xf32> to vector<256x128xf32>
        tpu.vector_store %arg9[%c512, %c0], %105 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg10[%c512, %c0], %120 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg8[%c512, %c0], %119 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      }
      %31 = arith.cmpi ne, %arg3, %c0_i32 : i32
      scf.if %31 {
        %63 = vector.load %arg9[%c512, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %64 = vector.load %arg10[%c512, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %65 = vector.load %arg8[%c512, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %66 = vector.extract_strided_slice %27 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %67 = vector.extract_strided_slice %29 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %68 = tpu.matmul %30, %66, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %69 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %70 = vector.broadcast %4 : i32 to vector<256x1024xi32>
        %71 = arith.addi %70, %69 : vector<256x1024xi32>
        %72 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %73 = vector.broadcast %2 : i32 to vector<256x1024xi32>
        %74 = arith.addi %73, %72 : vector<256x1024xi32>
        %75 = arith.cmpi sge, %71, %74 : vector<256x1024xi32>
        %76 = arith.select %75, %68, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %77 = vector.multi_reduction <maximumf>, %76, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %78 = vector.shape_cast %77 : vector<256xf32> to vector<256x1xf32>
        %79 = vector.broadcast %78 : vector<256x1xf32> to vector<256x1024xf32>
        %80 = arith.subf %76, %79 : vector<256x1024xf32>
        %81 = math.exp2 %80 : vector<256x1024xf32>
        %82 = arith.truncf %81 : vector<256x1024xf32> to vector<256x1024xbf16>
        %83 = vector.multi_reduction <add>, %81, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %84 = vector.shape_cast %83 : vector<256xf32> to vector<256x1xf32>
        %85 = tpu.matmul %82, %67, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %86 = vector.extract_strided_slice %27 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %87 = vector.extract_strided_slice %29 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %88 = tpu.matmul %30, %86, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %89 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %90 = vector.broadcast %4 : i32 to vector<256x1024xi32>
        %91 = arith.addi %90, %89 : vector<256x1024xi32>
        %92 = arith.addi %2, %c1024_i32 : i32
        %93 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %94 = vector.broadcast %92 : i32 to vector<256x1024xi32>
        %95 = arith.addi %94, %93 : vector<256x1024xi32>
        %96 = arith.cmpi sge, %91, %95 : vector<256x1024xi32>
        %97 = arith.select %96, %88, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %98 = vector.multi_reduction <maximumf>, %97, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %99 = vector.shape_cast %98 : vector<256xf32> to vector<256x1xf32>
        %100 = vector.broadcast %99 : vector<256x1xf32> to vector<256x1024xf32>
        %101 = arith.subf %97, %100 : vector<256x1024xf32>
        %102 = math.exp2 %101 : vector<256x1024xf32>
        %103 = arith.truncf %102 : vector<256x1024xf32> to vector<256x1024xbf16>
        %104 = vector.multi_reduction <add>, %102, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %105 = vector.shape_cast %104 : vector<256xf32> to vector<256x1xf32>
        %106 = tpu.matmul %103, %87, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %107 = arith.maximumf %78, %99 : vector<256x1xf32>
        %108 = vector.broadcast %107 : vector<256x1xf32> to vector<256x128xf32>
        %109 = arith.maximumf %63, %108 : vector<256x128xf32>
        %110 = vector.extract_strided_slice %109 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
        %111 = arith.subf %63, %109 : vector<256x128xf32>
        %112 = math.exp2 %111 : vector<256x128xf32>
        %113 = arith.subf %78, %110 : vector<256x1xf32>
        %114 = math.exp2 %113 : vector<256x1xf32>
        %115 = arith.mulf %84, %114 : vector<256x1xf32>
        %116 = arith.addf %115, %cst : vector<256x1xf32>
        %117 = vector.broadcast %114 : vector<256x1xf32> to vector<256x128xf32>
        %118 = arith.mulf %85, %117 : vector<256x128xf32>
        %119 = arith.addf %118, %cst_2 : vector<256x128xf32>
        %120 = arith.subf %99, %110 : vector<256x1xf32>
        %121 = math.exp2 %120 : vector<256x1xf32>
        %122 = arith.mulf %105, %121 : vector<256x1xf32>
        %123 = arith.addf %116, %122 : vector<256x1xf32>
        %124 = vector.broadcast %121 : vector<256x1xf32> to vector<256x128xf32>
        %125 = arith.mulf %106, %124 : vector<256x128xf32>
        %126 = arith.addf %119, %125 : vector<256x128xf32>
        %127 = arith.mulf %64, %112 : vector<256x128xf32>
        %128 = vector.broadcast %123 : vector<256x1xf32> to vector<256x128xf32>
        %129 = arith.addf %127, %128 : vector<256x128xf32>
        %130 = vector.extract_strided_slice %112 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
        %131 = vector.broadcast %130 : vector<256x1xf32> to vector<256x128xf32>
        %132 = arith.mulf %65, %131 : vector<256x128xf32>
        %133 = arith.addf %132, %126 : vector<256x128xf32>
        tpu.vector_store %arg9[%c512, %c0], %109 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg10[%c512, %c0], %129 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg8[%c512, %c0], %133 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      }
      %32 = vector.extract_strided_slice %25 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
      %33 = arith.addi %3, %c1792_i32 : i32
      scf.if %0 {
        %63 = vector.extract_strided_slice %27 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %64 = vector.extract_strided_slice %29 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %65 = tpu.matmul %32, %63, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %66 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %67 = vector.broadcast %33 : i32 to vector<256x1024xi32>
        %68 = arith.addi %67, %66 : vector<256x1024xi32>
        %69 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %70 = vector.broadcast %2 : i32 to vector<256x1024xi32>
        %71 = arith.addi %70, %69 : vector<256x1024xi32>
        %72 = arith.cmpi sge, %68, %71 : vector<256x1024xi32>
        %73 = arith.select %72, %65, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %74 = vector.multi_reduction <maximumf>, %73, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %75 = vector.shape_cast %74 : vector<256xf32> to vector<256x1xf32>
        %76 = vector.broadcast %75 : vector<256x1xf32> to vector<256x1024xf32>
        %77 = arith.subf %73, %76 : vector<256x1024xf32>
        %78 = math.exp2 %77 : vector<256x1024xf32>
        %79 = arith.truncf %78 : vector<256x1024xf32> to vector<256x1024xbf16>
        %80 = vector.multi_reduction <add>, %78, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %81 = vector.shape_cast %80 : vector<256xf32> to vector<256x1xf32>
        %82 = tpu.matmul %79, %64, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %83 = vector.extract_strided_slice %27 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %84 = vector.extract_strided_slice %29 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %85 = tpu.matmul %32, %83, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %86 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %87 = vector.broadcast %33 : i32 to vector<256x1024xi32>
        %88 = arith.addi %87, %86 : vector<256x1024xi32>
        %89 = arith.addi %2, %c1024_i32 : i32
        %90 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %91 = vector.broadcast %89 : i32 to vector<256x1024xi32>
        %92 = arith.addi %91, %90 : vector<256x1024xi32>
        %93 = arith.cmpi sge, %88, %92 : vector<256x1024xi32>
        %94 = arith.select %93, %85, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %95 = vector.multi_reduction <maximumf>, %94, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %96 = vector.shape_cast %95 : vector<256xf32> to vector<256x1xf32>
        %97 = vector.broadcast %96 : vector<256x1xf32> to vector<256x1024xf32>
        %98 = arith.subf %94, %97 : vector<256x1024xf32>
        %99 = math.exp2 %98 : vector<256x1024xf32>
        %100 = arith.truncf %99 : vector<256x1024xf32> to vector<256x1024xbf16>
        %101 = vector.multi_reduction <add>, %99, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %102 = vector.shape_cast %101 : vector<256xf32> to vector<256x1xf32>
        %103 = tpu.matmul %100, %84, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %104 = arith.maximumf %75, %96 : vector<256x1xf32>
        %105 = vector.broadcast %104 : vector<256x1xf32> to vector<256x128xf32>
        %106 = arith.subf %75, %104 : vector<256x1xf32>
        %107 = math.exp2 %106 : vector<256x1xf32>
        %108 = arith.mulf %81, %107 : vector<256x1xf32>
        %109 = arith.addf %108, %cst : vector<256x1xf32>
        %110 = vector.broadcast %107 : vector<256x1xf32> to vector<256x128xf32>
        %111 = arith.mulf %82, %110 : vector<256x128xf32>
        %112 = arith.addf %111, %cst_2 : vector<256x128xf32>
        %113 = arith.subf %96, %104 : vector<256x1xf32>
        %114 = math.exp2 %113 : vector<256x1xf32>
        %115 = arith.mulf %102, %114 : vector<256x1xf32>
        %116 = arith.addf %109, %115 : vector<256x1xf32>
        %117 = vector.broadcast %114 : vector<256x1xf32> to vector<256x128xf32>
        %118 = arith.mulf %103, %117 : vector<256x128xf32>
        %119 = arith.addf %112, %118 : vector<256x128xf32>
        %120 = vector.broadcast %116 : vector<256x1xf32> to vector<256x128xf32>
        tpu.vector_store %arg9[%c768, %c0], %105 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg10[%c768, %c0], %120 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg8[%c768, %c0], %119 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      }
      %34 = arith.cmpi ne, %arg3, %c0_i32 : i32
      scf.if %34 {
        %63 = vector.load %arg9[%c768, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %64 = vector.load %arg10[%c768, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %65 = vector.load %arg8[%c768, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %66 = vector.extract_strided_slice %27 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %67 = vector.extract_strided_slice %29 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %68 = tpu.matmul %32, %66, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %69 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %70 = vector.broadcast %33 : i32 to vector<256x1024xi32>
        %71 = arith.addi %70, %69 : vector<256x1024xi32>
        %72 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %73 = vector.broadcast %2 : i32 to vector<256x1024xi32>
        %74 = arith.addi %73, %72 : vector<256x1024xi32>
        %75 = arith.cmpi sge, %71, %74 : vector<256x1024xi32>
        %76 = arith.select %75, %68, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %77 = vector.multi_reduction <maximumf>, %76, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %78 = vector.shape_cast %77 : vector<256xf32> to vector<256x1xf32>
        %79 = vector.broadcast %78 : vector<256x1xf32> to vector<256x1024xf32>
        %80 = arith.subf %76, %79 : vector<256x1024xf32>
        %81 = math.exp2 %80 : vector<256x1024xf32>
        %82 = arith.truncf %81 : vector<256x1024xf32> to vector<256x1024xbf16>
        %83 = vector.multi_reduction <add>, %81, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %84 = vector.shape_cast %83 : vector<256xf32> to vector<256x1xf32>
        %85 = tpu.matmul %82, %67, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %86 = vector.extract_strided_slice %27 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %87 = vector.extract_strided_slice %29 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %88 = tpu.matmul %32, %86, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %89 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %90 = vector.broadcast %33 : i32 to vector<256x1024xi32>
        %91 = arith.addi %90, %89 : vector<256x1024xi32>
        %92 = arith.addi %2, %c1024_i32 : i32
        %93 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %94 = vector.broadcast %92 : i32 to vector<256x1024xi32>
        %95 = arith.addi %94, %93 : vector<256x1024xi32>
        %96 = arith.cmpi sge, %91, %95 : vector<256x1024xi32>
        %97 = arith.select %96, %88, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %98 = vector.multi_reduction <maximumf>, %97, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %99 = vector.shape_cast %98 : vector<256xf32> to vector<256x1xf32>
        %100 = vector.broadcast %99 : vector<256x1xf32> to vector<256x1024xf32>
        %101 = arith.subf %97, %100 : vector<256x1024xf32>
        %102 = math.exp2 %101 : vector<256x1024xf32>
        %103 = arith.truncf %102 : vector<256x1024xf32> to vector<256x1024xbf16>
        %104 = vector.multi_reduction <add>, %102, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %105 = vector.shape_cast %104 : vector<256xf32> to vector<256x1xf32>
        %106 = tpu.matmul %103, %87, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %107 = arith.maximumf %78, %99 : vector<256x1xf32>
        %108 = vector.broadcast %107 : vector<256x1xf32> to vector<256x128xf32>
        %109 = arith.maximumf %63, %108 : vector<256x128xf32>
        %110 = vector.extract_strided_slice %109 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
        %111 = arith.subf %63, %109 : vector<256x128xf32>
        %112 = math.exp2 %111 : vector<256x128xf32>
        %113 = arith.subf %78, %110 : vector<256x1xf32>
        %114 = math.exp2 %113 : vector<256x1xf32>
        %115 = arith.mulf %84, %114 : vector<256x1xf32>
        %116 = arith.addf %115, %cst : vector<256x1xf32>
        %117 = vector.broadcast %114 : vector<256x1xf32> to vector<256x128xf32>
        %118 = arith.mulf %85, %117 : vector<256x128xf32>
        %119 = arith.addf %118, %cst_2 : vector<256x128xf32>
        %120 = arith.subf %99, %110 : vector<256x1xf32>
        %121 = math.exp2 %120 : vector<256x1xf32>
        %122 = arith.mulf %105, %121 : vector<256x1xf32>
        %123 = arith.addf %116, %122 : vector<256x1xf32>
        %124 = vector.broadcast %121 : vector<256x1xf32> to vector<256x128xf32>
        %125 = arith.mulf %106, %124 : vector<256x128xf32>
        %126 = arith.addf %119, %125 : vector<256x128xf32>
        %127 = arith.mulf %64, %112 : vector<256x128xf32>
        %128 = vector.broadcast %123 : vector<256x1xf32> to vector<256x128xf32>
        %129 = arith.addf %127, %128 : vector<256x128xf32>
        %130 = vector.extract_strided_slice %112 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
        %131 = vector.broadcast %130 : vector<256x1xf32> to vector<256x128xf32>
        %132 = arith.mulf %65, %131 : vector<256x128xf32>
        %133 = arith.addf %132, %126 : vector<256x128xf32>
        tpu.vector_store %arg9[%c768, %c0], %109 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg10[%c768, %c0], %129 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg8[%c768, %c0], %133 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      }
      %35 = vector.load %arg4[%c0, %c2, %c0, %c0] : memref<1x4x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
      %36 = vector.shape_cast %35 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
      %37 = arith.extf %36 : vector<512x128xbf16> to vector<512x128xf32>
      %38 = arith.mulf %37, %cst_1 : vector<512x128xf32>
      %39 = arith.truncf %38 : vector<512x128xf32> to vector<512x128xbf16>
      %40 = vector.load %arg5[%c0, %c2, %c0, %c0] : memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x2048x128xbf16>
      %41 = vector.shape_cast %40 : vector<1x1x2048x128xbf16> to vector<2048x128xbf16>
      %42 = vector.load %arg6[%c0, %c2, %c0, %c0] : memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x2048x128xbf16>
      %43 = vector.shape_cast %42 : vector<1x1x2048x128xbf16> to vector<2048x128xbf16>
      %44 = vector.extract_strided_slice %39 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
      scf.if %0 {
        %63 = vector.extract_strided_slice %41 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %64 = vector.extract_strided_slice %43 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %65 = tpu.matmul %44, %63, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %66 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %67 = vector.broadcast %4 : i32 to vector<256x1024xi32>
        %68 = arith.addi %67, %66 : vector<256x1024xi32>
        %69 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %70 = vector.broadcast %2 : i32 to vector<256x1024xi32>
        %71 = arith.addi %70, %69 : vector<256x1024xi32>
        %72 = arith.cmpi sge, %68, %71 : vector<256x1024xi32>
        %73 = arith.select %72, %65, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %74 = vector.multi_reduction <maximumf>, %73, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %75 = vector.shape_cast %74 : vector<256xf32> to vector<256x1xf32>
        %76 = vector.broadcast %75 : vector<256x1xf32> to vector<256x1024xf32>
        %77 = arith.subf %73, %76 : vector<256x1024xf32>
        %78 = math.exp2 %77 : vector<256x1024xf32>
        %79 = arith.truncf %78 : vector<256x1024xf32> to vector<256x1024xbf16>
        %80 = vector.multi_reduction <add>, %78, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %81 = vector.shape_cast %80 : vector<256xf32> to vector<256x1xf32>
        %82 = tpu.matmul %79, %64, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %83 = vector.extract_strided_slice %41 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %84 = vector.extract_strided_slice %43 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %85 = tpu.matmul %44, %83, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %86 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %87 = vector.broadcast %4 : i32 to vector<256x1024xi32>
        %88 = arith.addi %87, %86 : vector<256x1024xi32>
        %89 = arith.addi %2, %c1024_i32 : i32
        %90 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %91 = vector.broadcast %89 : i32 to vector<256x1024xi32>
        %92 = arith.addi %91, %90 : vector<256x1024xi32>
        %93 = arith.cmpi sge, %88, %92 : vector<256x1024xi32>
        %94 = arith.select %93, %85, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %95 = vector.multi_reduction <maximumf>, %94, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %96 = vector.shape_cast %95 : vector<256xf32> to vector<256x1xf32>
        %97 = vector.broadcast %96 : vector<256x1xf32> to vector<256x1024xf32>
        %98 = arith.subf %94, %97 : vector<256x1024xf32>
        %99 = math.exp2 %98 : vector<256x1024xf32>
        %100 = arith.truncf %99 : vector<256x1024xf32> to vector<256x1024xbf16>
        %101 = vector.multi_reduction <add>, %99, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %102 = vector.shape_cast %101 : vector<256xf32> to vector<256x1xf32>
        %103 = tpu.matmul %100, %84, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %104 = arith.maximumf %75, %96 : vector<256x1xf32>
        %105 = vector.broadcast %104 : vector<256x1xf32> to vector<256x128xf32>
        %106 = arith.subf %75, %104 : vector<256x1xf32>
        %107 = math.exp2 %106 : vector<256x1xf32>
        %108 = arith.mulf %81, %107 : vector<256x1xf32>
        %109 = arith.addf %108, %cst : vector<256x1xf32>
        %110 = vector.broadcast %107 : vector<256x1xf32> to vector<256x128xf32>
        %111 = arith.mulf %82, %110 : vector<256x128xf32>
        %112 = arith.addf %111, %cst_2 : vector<256x128xf32>
        %113 = arith.subf %96, %104 : vector<256x1xf32>
        %114 = math.exp2 %113 : vector<256x1xf32>
        %115 = arith.mulf %102, %114 : vector<256x1xf32>
        %116 = arith.addf %109, %115 : vector<256x1xf32>
        %117 = vector.broadcast %114 : vector<256x1xf32> to vector<256x128xf32>
        %118 = arith.mulf %103, %117 : vector<256x128xf32>
        %119 = arith.addf %112, %118 : vector<256x128xf32>
        %120 = vector.broadcast %116 : vector<256x1xf32> to vector<256x128xf32>
        tpu.vector_store %arg9[%c1024, %c0], %105 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg10[%c1024, %c0], %120 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg8[%c1024, %c0], %119 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      }
      %45 = arith.cmpi ne, %arg3, %c0_i32 : i32
      scf.if %45 {
        %63 = vector.load %arg9[%c1024, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %64 = vector.load %arg10[%c1024, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %65 = vector.load %arg8[%c1024, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %66 = vector.extract_strided_slice %41 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %67 = vector.extract_strided_slice %43 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %68 = tpu.matmul %44, %66, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %69 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %70 = vector.broadcast %4 : i32 to vector<256x1024xi32>
        %71 = arith.addi %70, %69 : vector<256x1024xi32>
        %72 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %73 = vector.broadcast %2 : i32 to vector<256x1024xi32>
        %74 = arith.addi %73, %72 : vector<256x1024xi32>
        %75 = arith.cmpi sge, %71, %74 : vector<256x1024xi32>
        %76 = arith.select %75, %68, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %77 = vector.multi_reduction <maximumf>, %76, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %78 = vector.shape_cast %77 : vector<256xf32> to vector<256x1xf32>
        %79 = vector.broadcast %78 : vector<256x1xf32> to vector<256x1024xf32>
        %80 = arith.subf %76, %79 : vector<256x1024xf32>
        %81 = math.exp2 %80 : vector<256x1024xf32>
        %82 = arith.truncf %81 : vector<256x1024xf32> to vector<256x1024xbf16>
        %83 = vector.multi_reduction <add>, %81, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %84 = vector.shape_cast %83 : vector<256xf32> to vector<256x1xf32>
        %85 = tpu.matmul %82, %67, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %86 = vector.extract_strided_slice %41 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %87 = vector.extract_strided_slice %43 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %88 = tpu.matmul %44, %86, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %89 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %90 = vector.broadcast %4 : i32 to vector<256x1024xi32>
        %91 = arith.addi %90, %89 : vector<256x1024xi32>
        %92 = arith.addi %2, %c1024_i32 : i32
        %93 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %94 = vector.broadcast %92 : i32 to vector<256x1024xi32>
        %95 = arith.addi %94, %93 : vector<256x1024xi32>
        %96 = arith.cmpi sge, %91, %95 : vector<256x1024xi32>
        %97 = arith.select %96, %88, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %98 = vector.multi_reduction <maximumf>, %97, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %99 = vector.shape_cast %98 : vector<256xf32> to vector<256x1xf32>
        %100 = vector.broadcast %99 : vector<256x1xf32> to vector<256x1024xf32>
        %101 = arith.subf %97, %100 : vector<256x1024xf32>
        %102 = math.exp2 %101 : vector<256x1024xf32>
        %103 = arith.truncf %102 : vector<256x1024xf32> to vector<256x1024xbf16>
        %104 = vector.multi_reduction <add>, %102, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %105 = vector.shape_cast %104 : vector<256xf32> to vector<256x1xf32>
        %106 = tpu.matmul %103, %87, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %107 = arith.maximumf %78, %99 : vector<256x1xf32>
        %108 = vector.broadcast %107 : vector<256x1xf32> to vector<256x128xf32>
        %109 = arith.maximumf %63, %108 : vector<256x128xf32>
        %110 = vector.extract_strided_slice %109 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
        %111 = arith.subf %63, %109 : vector<256x128xf32>
        %112 = math.exp2 %111 : vector<256x128xf32>
        %113 = arith.subf %78, %110 : vector<256x1xf32>
        %114 = math.exp2 %113 : vector<256x1xf32>
        %115 = arith.mulf %84, %114 : vector<256x1xf32>
        %116 = arith.addf %115, %cst : vector<256x1xf32>
        %117 = vector.broadcast %114 : vector<256x1xf32> to vector<256x128xf32>
        %118 = arith.mulf %85, %117 : vector<256x128xf32>
        %119 = arith.addf %118, %cst_2 : vector<256x128xf32>
        %120 = arith.subf %99, %110 : vector<256x1xf32>
        %121 = math.exp2 %120 : vector<256x1xf32>
        %122 = arith.mulf %105, %121 : vector<256x1xf32>
        %123 = arith.addf %116, %122 : vector<256x1xf32>
        %124 = vector.broadcast %121 : vector<256x1xf32> to vector<256x128xf32>
        %125 = arith.mulf %106, %124 : vector<256x128xf32>
        %126 = arith.addf %119, %125 : vector<256x128xf32>
        %127 = arith.mulf %64, %112 : vector<256x128xf32>
        %128 = vector.broadcast %123 : vector<256x1xf32> to vector<256x128xf32>
        %129 = arith.addf %127, %128 : vector<256x128xf32>
        %130 = vector.extract_strided_slice %112 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
        %131 = vector.broadcast %130 : vector<256x1xf32> to vector<256x128xf32>
        %132 = arith.mulf %65, %131 : vector<256x128xf32>
        %133 = arith.addf %132, %126 : vector<256x128xf32>
        tpu.vector_store %arg9[%c1024, %c0], %109 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg10[%c1024, %c0], %129 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg8[%c1024, %c0], %133 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      }
      %46 = vector.extract_strided_slice %39 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
      %47 = arith.addi %3, %c1792_i32 : i32
      scf.if %0 {
        %63 = vector.extract_strided_slice %41 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %64 = vector.extract_strided_slice %43 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %65 = tpu.matmul %46, %63, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %66 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %67 = vector.broadcast %47 : i32 to vector<256x1024xi32>
        %68 = arith.addi %67, %66 : vector<256x1024xi32>
        %69 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %70 = vector.broadcast %2 : i32 to vector<256x1024xi32>
        %71 = arith.addi %70, %69 : vector<256x1024xi32>
        %72 = arith.cmpi sge, %68, %71 : vector<256x1024xi32>
        %73 = arith.select %72, %65, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %74 = vector.multi_reduction <maximumf>, %73, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %75 = vector.shape_cast %74 : vector<256xf32> to vector<256x1xf32>
        %76 = vector.broadcast %75 : vector<256x1xf32> to vector<256x1024xf32>
        %77 = arith.subf %73, %76 : vector<256x1024xf32>
        %78 = math.exp2 %77 : vector<256x1024xf32>
        %79 = arith.truncf %78 : vector<256x1024xf32> to vector<256x1024xbf16>
        %80 = vector.multi_reduction <add>, %78, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %81 = vector.shape_cast %80 : vector<256xf32> to vector<256x1xf32>
        %82 = tpu.matmul %79, %64, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %83 = vector.extract_strided_slice %41 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %84 = vector.extract_strided_slice %43 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %85 = tpu.matmul %46, %83, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %86 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %87 = vector.broadcast %47 : i32 to vector<256x1024xi32>
        %88 = arith.addi %87, %86 : vector<256x1024xi32>
        %89 = arith.addi %2, %c1024_i32 : i32
        %90 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %91 = vector.broadcast %89 : i32 to vector<256x1024xi32>
        %92 = arith.addi %91, %90 : vector<256x1024xi32>
        %93 = arith.cmpi sge, %88, %92 : vector<256x1024xi32>
        %94 = arith.select %93, %85, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %95 = vector.multi_reduction <maximumf>, %94, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %96 = vector.shape_cast %95 : vector<256xf32> to vector<256x1xf32>
        %97 = vector.broadcast %96 : vector<256x1xf32> to vector<256x1024xf32>
        %98 = arith.subf %94, %97 : vector<256x1024xf32>
        %99 = math.exp2 %98 : vector<256x1024xf32>
        %100 = arith.truncf %99 : vector<256x1024xf32> to vector<256x1024xbf16>
        %101 = vector.multi_reduction <add>, %99, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %102 = vector.shape_cast %101 : vector<256xf32> to vector<256x1xf32>
        %103 = tpu.matmul %100, %84, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %104 = arith.maximumf %75, %96 : vector<256x1xf32>
        %105 = vector.broadcast %104 : vector<256x1xf32> to vector<256x128xf32>
        %106 = arith.subf %75, %104 : vector<256x1xf32>
        %107 = math.exp2 %106 : vector<256x1xf32>
        %108 = arith.mulf %81, %107 : vector<256x1xf32>
        %109 = arith.addf %108, %cst : vector<256x1xf32>
        %110 = vector.broadcast %107 : vector<256x1xf32> to vector<256x128xf32>
        %111 = arith.mulf %82, %110 : vector<256x128xf32>
        %112 = arith.addf %111, %cst_2 : vector<256x128xf32>
        %113 = arith.subf %96, %104 : vector<256x1xf32>
        %114 = math.exp2 %113 : vector<256x1xf32>
        %115 = arith.mulf %102, %114 : vector<256x1xf32>
        %116 = arith.addf %109, %115 : vector<256x1xf32>
        %117 = vector.broadcast %114 : vector<256x1xf32> to vector<256x128xf32>
        %118 = arith.mulf %103, %117 : vector<256x128xf32>
        %119 = arith.addf %112, %118 : vector<256x128xf32>
        %120 = vector.broadcast %116 : vector<256x1xf32> to vector<256x128xf32>
        tpu.vector_store %arg9[%c1280, %c0], %105 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg10[%c1280, %c0], %120 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg8[%c1280, %c0], %119 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      }
      %48 = arith.cmpi ne, %arg3, %c0_i32 : i32
      scf.if %48 {
        %63 = vector.load %arg9[%c1280, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %64 = vector.load %arg10[%c1280, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %65 = vector.load %arg8[%c1280, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %66 = vector.extract_strided_slice %41 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %67 = vector.extract_strided_slice %43 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %68 = tpu.matmul %46, %66, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %69 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %70 = vector.broadcast %47 : i32 to vector<256x1024xi32>
        %71 = arith.addi %70, %69 : vector<256x1024xi32>
        %72 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %73 = vector.broadcast %2 : i32 to vector<256x1024xi32>
        %74 = arith.addi %73, %72 : vector<256x1024xi32>
        %75 = arith.cmpi sge, %71, %74 : vector<256x1024xi32>
        %76 = arith.select %75, %68, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %77 = vector.multi_reduction <maximumf>, %76, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %78 = vector.shape_cast %77 : vector<256xf32> to vector<256x1xf32>
        %79 = vector.broadcast %78 : vector<256x1xf32> to vector<256x1024xf32>
        %80 = arith.subf %76, %79 : vector<256x1024xf32>
        %81 = math.exp2 %80 : vector<256x1024xf32>
        %82 = arith.truncf %81 : vector<256x1024xf32> to vector<256x1024xbf16>
        %83 = vector.multi_reduction <add>, %81, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %84 = vector.shape_cast %83 : vector<256xf32> to vector<256x1xf32>
        %85 = tpu.matmul %82, %67, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %86 = vector.extract_strided_slice %41 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %87 = vector.extract_strided_slice %43 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %88 = tpu.matmul %46, %86, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %89 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %90 = vector.broadcast %47 : i32 to vector<256x1024xi32>
        %91 = arith.addi %90, %89 : vector<256x1024xi32>
        %92 = arith.addi %2, %c1024_i32 : i32
        %93 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %94 = vector.broadcast %92 : i32 to vector<256x1024xi32>
        %95 = arith.addi %94, %93 : vector<256x1024xi32>
        %96 = arith.cmpi sge, %91, %95 : vector<256x1024xi32>
        %97 = arith.select %96, %88, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %98 = vector.multi_reduction <maximumf>, %97, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %99 = vector.shape_cast %98 : vector<256xf32> to vector<256x1xf32>
        %100 = vector.broadcast %99 : vector<256x1xf32> to vector<256x1024xf32>
        %101 = arith.subf %97, %100 : vector<256x1024xf32>
        %102 = math.exp2 %101 : vector<256x1024xf32>
        %103 = arith.truncf %102 : vector<256x1024xf32> to vector<256x1024xbf16>
        %104 = vector.multi_reduction <add>, %102, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %105 = vector.shape_cast %104 : vector<256xf32> to vector<256x1xf32>
        %106 = tpu.matmul %103, %87, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %107 = arith.maximumf %78, %99 : vector<256x1xf32>
        %108 = vector.broadcast %107 : vector<256x1xf32> to vector<256x128xf32>
        %109 = arith.maximumf %63, %108 : vector<256x128xf32>
        %110 = vector.extract_strided_slice %109 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
        %111 = arith.subf %63, %109 : vector<256x128xf32>
        %112 = math.exp2 %111 : vector<256x128xf32>
        %113 = arith.subf %78, %110 : vector<256x1xf32>
        %114 = math.exp2 %113 : vector<256x1xf32>
        %115 = arith.mulf %84, %114 : vector<256x1xf32>
        %116 = arith.addf %115, %cst : vector<256x1xf32>
        %117 = vector.broadcast %114 : vector<256x1xf32> to vector<256x128xf32>
        %118 = arith.mulf %85, %117 : vector<256x128xf32>
        %119 = arith.addf %118, %cst_2 : vector<256x128xf32>
        %120 = arith.subf %99, %110 : vector<256x1xf32>
        %121 = math.exp2 %120 : vector<256x1xf32>
        %122 = arith.mulf %105, %121 : vector<256x1xf32>
        %123 = arith.addf %116, %122 : vector<256x1xf32>
        %124 = vector.broadcast %121 : vector<256x1xf32> to vector<256x128xf32>
        %125 = arith.mulf %106, %124 : vector<256x128xf32>
        %126 = arith.addf %119, %125 : vector<256x128xf32>
        %127 = arith.mulf %64, %112 : vector<256x128xf32>
        %128 = vector.broadcast %123 : vector<256x1xf32> to vector<256x128xf32>
        %129 = arith.addf %127, %128 : vector<256x128xf32>
        %130 = vector.extract_strided_slice %112 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
        %131 = vector.broadcast %130 : vector<256x1xf32> to vector<256x128xf32>
        %132 = arith.mulf %65, %131 : vector<256x128xf32>
        %133 = arith.addf %132, %126 : vector<256x128xf32>
        tpu.vector_store %arg9[%c1280, %c0], %109 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg10[%c1280, %c0], %129 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg8[%c1280, %c0], %133 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      }
      %49 = vector.load %arg4[%c0, %c3, %c0, %c0] : memref<1x4x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
      %50 = vector.shape_cast %49 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
      %51 = arith.extf %50 : vector<512x128xbf16> to vector<512x128xf32>
      %52 = arith.mulf %51, %cst_1 : vector<512x128xf32>
      %53 = arith.truncf %52 : vector<512x128xf32> to vector<512x128xbf16>
      %54 = vector.load %arg5[%c0, %c3, %c0, %c0] : memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x2048x128xbf16>
      %55 = vector.shape_cast %54 : vector<1x1x2048x128xbf16> to vector<2048x128xbf16>
      %56 = vector.load %arg6[%c0, %c3, %c0, %c0] : memref<1x4x2048x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x2048x128xbf16>
      %57 = vector.shape_cast %56 : vector<1x1x2048x128xbf16> to vector<2048x128xbf16>
      %58 = vector.extract_strided_slice %53 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
      scf.if %0 {
        %63 = vector.extract_strided_slice %55 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %64 = vector.extract_strided_slice %57 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %65 = tpu.matmul %58, %63, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %66 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %67 = vector.broadcast %4 : i32 to vector<256x1024xi32>
        %68 = arith.addi %67, %66 : vector<256x1024xi32>
        %69 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %70 = vector.broadcast %2 : i32 to vector<256x1024xi32>
        %71 = arith.addi %70, %69 : vector<256x1024xi32>
        %72 = arith.cmpi sge, %68, %71 : vector<256x1024xi32>
        %73 = arith.select %72, %65, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %74 = vector.multi_reduction <maximumf>, %73, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %75 = vector.shape_cast %74 : vector<256xf32> to vector<256x1xf32>
        %76 = vector.broadcast %75 : vector<256x1xf32> to vector<256x1024xf32>
        %77 = arith.subf %73, %76 : vector<256x1024xf32>
        %78 = math.exp2 %77 : vector<256x1024xf32>
        %79 = arith.truncf %78 : vector<256x1024xf32> to vector<256x1024xbf16>
        %80 = vector.multi_reduction <add>, %78, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %81 = vector.shape_cast %80 : vector<256xf32> to vector<256x1xf32>
        %82 = tpu.matmul %79, %64, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %83 = vector.extract_strided_slice %55 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %84 = vector.extract_strided_slice %57 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %85 = tpu.matmul %58, %83, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %86 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %87 = vector.broadcast %4 : i32 to vector<256x1024xi32>
        %88 = arith.addi %87, %86 : vector<256x1024xi32>
        %89 = arith.addi %2, %c1024_i32 : i32
        %90 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %91 = vector.broadcast %89 : i32 to vector<256x1024xi32>
        %92 = arith.addi %91, %90 : vector<256x1024xi32>
        %93 = arith.cmpi sge, %88, %92 : vector<256x1024xi32>
        %94 = arith.select %93, %85, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %95 = vector.multi_reduction <maximumf>, %94, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %96 = vector.shape_cast %95 : vector<256xf32> to vector<256x1xf32>
        %97 = vector.broadcast %96 : vector<256x1xf32> to vector<256x1024xf32>
        %98 = arith.subf %94, %97 : vector<256x1024xf32>
        %99 = math.exp2 %98 : vector<256x1024xf32>
        %100 = arith.truncf %99 : vector<256x1024xf32> to vector<256x1024xbf16>
        %101 = vector.multi_reduction <add>, %99, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %102 = vector.shape_cast %101 : vector<256xf32> to vector<256x1xf32>
        %103 = tpu.matmul %100, %84, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %104 = arith.maximumf %75, %96 : vector<256x1xf32>
        %105 = vector.broadcast %104 : vector<256x1xf32> to vector<256x128xf32>
        %106 = arith.subf %75, %104 : vector<256x1xf32>
        %107 = math.exp2 %106 : vector<256x1xf32>
        %108 = arith.mulf %81, %107 : vector<256x1xf32>
        %109 = arith.addf %108, %cst : vector<256x1xf32>
        %110 = vector.broadcast %107 : vector<256x1xf32> to vector<256x128xf32>
        %111 = arith.mulf %82, %110 : vector<256x128xf32>
        %112 = arith.addf %111, %cst_2 : vector<256x128xf32>
        %113 = arith.subf %96, %104 : vector<256x1xf32>
        %114 = math.exp2 %113 : vector<256x1xf32>
        %115 = arith.mulf %102, %114 : vector<256x1xf32>
        %116 = arith.addf %109, %115 : vector<256x1xf32>
        %117 = vector.broadcast %114 : vector<256x1xf32> to vector<256x128xf32>
        %118 = arith.mulf %103, %117 : vector<256x128xf32>
        %119 = arith.addf %112, %118 : vector<256x128xf32>
        %120 = vector.broadcast %116 : vector<256x1xf32> to vector<256x128xf32>
        tpu.vector_store %arg9[%c1536, %c0], %105 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg10[%c1536, %c0], %120 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg8[%c1536, %c0], %119 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      }
      %59 = arith.cmpi ne, %arg3, %c0_i32 : i32
      scf.if %59 {
        %63 = vector.load %arg9[%c1536, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %64 = vector.load %arg10[%c1536, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %65 = vector.load %arg8[%c1536, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %66 = vector.extract_strided_slice %55 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %67 = vector.extract_strided_slice %57 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %68 = tpu.matmul %58, %66, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %69 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %70 = vector.broadcast %4 : i32 to vector<256x1024xi32>
        %71 = arith.addi %70, %69 : vector<256x1024xi32>
        %72 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %73 = vector.broadcast %2 : i32 to vector<256x1024xi32>
        %74 = arith.addi %73, %72 : vector<256x1024xi32>
        %75 = arith.cmpi sge, %71, %74 : vector<256x1024xi32>
        %76 = arith.select %75, %68, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %77 = vector.multi_reduction <maximumf>, %76, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %78 = vector.shape_cast %77 : vector<256xf32> to vector<256x1xf32>
        %79 = vector.broadcast %78 : vector<256x1xf32> to vector<256x1024xf32>
        %80 = arith.subf %76, %79 : vector<256x1024xf32>
        %81 = math.exp2 %80 : vector<256x1024xf32>
        %82 = arith.truncf %81 : vector<256x1024xf32> to vector<256x1024xbf16>
        %83 = vector.multi_reduction <add>, %81, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %84 = vector.shape_cast %83 : vector<256xf32> to vector<256x1xf32>
        %85 = tpu.matmul %82, %67, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %86 = vector.extract_strided_slice %55 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %87 = vector.extract_strided_slice %57 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %88 = tpu.matmul %58, %86, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %89 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %90 = vector.broadcast %4 : i32 to vector<256x1024xi32>
        %91 = arith.addi %90, %89 : vector<256x1024xi32>
        %92 = arith.addi %2, %c1024_i32 : i32
        %93 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %94 = vector.broadcast %92 : i32 to vector<256x1024xi32>
        %95 = arith.addi %94, %93 : vector<256x1024xi32>
        %96 = arith.cmpi sge, %91, %95 : vector<256x1024xi32>
        %97 = arith.select %96, %88, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %98 = vector.multi_reduction <maximumf>, %97, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %99 = vector.shape_cast %98 : vector<256xf32> to vector<256x1xf32>
        %100 = vector.broadcast %99 : vector<256x1xf32> to vector<256x1024xf32>
        %101 = arith.subf %97, %100 : vector<256x1024xf32>
        %102 = math.exp2 %101 : vector<256x1024xf32>
        %103 = arith.truncf %102 : vector<256x1024xf32> to vector<256x1024xbf16>
        %104 = vector.multi_reduction <add>, %102, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %105 = vector.shape_cast %104 : vector<256xf32> to vector<256x1xf32>
        %106 = tpu.matmul %103, %87, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %107 = arith.maximumf %78, %99 : vector<256x1xf32>
        %108 = vector.broadcast %107 : vector<256x1xf32> to vector<256x128xf32>
        %109 = arith.maximumf %63, %108 : vector<256x128xf32>
        %110 = vector.extract_strided_slice %109 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
        %111 = arith.subf %63, %109 : vector<256x128xf32>
        %112 = math.exp2 %111 : vector<256x128xf32>
        %113 = arith.subf %78, %110 : vector<256x1xf32>
        %114 = math.exp2 %113 : vector<256x1xf32>
        %115 = arith.mulf %84, %114 : vector<256x1xf32>
        %116 = arith.addf %115, %cst : vector<256x1xf32>
        %117 = vector.broadcast %114 : vector<256x1xf32> to vector<256x128xf32>
        %118 = arith.mulf %85, %117 : vector<256x128xf32>
        %119 = arith.addf %118, %cst_2 : vector<256x128xf32>
        %120 = arith.subf %99, %110 : vector<256x1xf32>
        %121 = math.exp2 %120 : vector<256x1xf32>
        %122 = arith.mulf %105, %121 : vector<256x1xf32>
        %123 = arith.addf %116, %122 : vector<256x1xf32>
        %124 = vector.broadcast %121 : vector<256x1xf32> to vector<256x128xf32>
        %125 = arith.mulf %106, %124 : vector<256x128xf32>
        %126 = arith.addf %119, %125 : vector<256x128xf32>
        %127 = arith.mulf %64, %112 : vector<256x128xf32>
        %128 = vector.broadcast %123 : vector<256x1xf32> to vector<256x128xf32>
        %129 = arith.addf %127, %128 : vector<256x128xf32>
        %130 = vector.extract_strided_slice %112 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
        %131 = vector.broadcast %130 : vector<256x1xf32> to vector<256x128xf32>
        %132 = arith.mulf %65, %131 : vector<256x128xf32>
        %133 = arith.addf %132, %126 : vector<256x128xf32>
        tpu.vector_store %arg9[%c1536, %c0], %109 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg10[%c1536, %c0], %129 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg8[%c1536, %c0], %133 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      }
      %60 = vector.extract_strided_slice %53 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
      %61 = arith.addi %3, %c1792_i32 : i32
      scf.if %0 {
        %63 = vector.extract_strided_slice %55 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %64 = vector.extract_strided_slice %57 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %65 = tpu.matmul %60, %63, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %66 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %67 = vector.broadcast %61 : i32 to vector<256x1024xi32>
        %68 = arith.addi %67, %66 : vector<256x1024xi32>
        %69 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %70 = vector.broadcast %2 : i32 to vector<256x1024xi32>
        %71 = arith.addi %70, %69 : vector<256x1024xi32>
        %72 = arith.cmpi sge, %68, %71 : vector<256x1024xi32>
        %73 = arith.select %72, %65, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %74 = vector.multi_reduction <maximumf>, %73, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %75 = vector.shape_cast %74 : vector<256xf32> to vector<256x1xf32>
        %76 = vector.broadcast %75 : vector<256x1xf32> to vector<256x1024xf32>
        %77 = arith.subf %73, %76 : vector<256x1024xf32>
        %78 = math.exp2 %77 : vector<256x1024xf32>
        %79 = arith.truncf %78 : vector<256x1024xf32> to vector<256x1024xbf16>
        %80 = vector.multi_reduction <add>, %78, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %81 = vector.shape_cast %80 : vector<256xf32> to vector<256x1xf32>
        %82 = tpu.matmul %79, %64, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %83 = vector.extract_strided_slice %55 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %84 = vector.extract_strided_slice %57 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %85 = tpu.matmul %60, %83, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %86 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %87 = vector.broadcast %61 : i32 to vector<256x1024xi32>
        %88 = arith.addi %87, %86 : vector<256x1024xi32>
        %89 = arith.addi %2, %c1024_i32 : i32
        %90 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %91 = vector.broadcast %89 : i32 to vector<256x1024xi32>
        %92 = arith.addi %91, %90 : vector<256x1024xi32>
        %93 = arith.cmpi sge, %88, %92 : vector<256x1024xi32>
        %94 = arith.select %93, %85, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %95 = vector.multi_reduction <maximumf>, %94, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %96 = vector.shape_cast %95 : vector<256xf32> to vector<256x1xf32>
        %97 = vector.broadcast %96 : vector<256x1xf32> to vector<256x1024xf32>
        %98 = arith.subf %94, %97 : vector<256x1024xf32>
        %99 = math.exp2 %98 : vector<256x1024xf32>
        %100 = arith.truncf %99 : vector<256x1024xf32> to vector<256x1024xbf16>
        %101 = vector.multi_reduction <add>, %99, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %102 = vector.shape_cast %101 : vector<256xf32> to vector<256x1xf32>
        %103 = tpu.matmul %100, %84, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %104 = arith.maximumf %75, %96 : vector<256x1xf32>
        %105 = vector.broadcast %104 : vector<256x1xf32> to vector<256x128xf32>
        %106 = arith.subf %75, %104 : vector<256x1xf32>
        %107 = math.exp2 %106 : vector<256x1xf32>
        %108 = arith.mulf %81, %107 : vector<256x1xf32>
        %109 = arith.addf %108, %cst : vector<256x1xf32>
        %110 = vector.broadcast %107 : vector<256x1xf32> to vector<256x128xf32>
        %111 = arith.mulf %82, %110 : vector<256x128xf32>
        %112 = arith.addf %111, %cst_2 : vector<256x128xf32>
        %113 = arith.subf %96, %104 : vector<256x1xf32>
        %114 = math.exp2 %113 : vector<256x1xf32>
        %115 = arith.mulf %102, %114 : vector<256x1xf32>
        %116 = arith.addf %109, %115 : vector<256x1xf32>
        %117 = vector.broadcast %114 : vector<256x1xf32> to vector<256x128xf32>
        %118 = arith.mulf %103, %117 : vector<256x128xf32>
        %119 = arith.addf %112, %118 : vector<256x128xf32>
        %120 = vector.broadcast %116 : vector<256x1xf32> to vector<256x128xf32>
        tpu.vector_store %arg9[%c1792, %c0], %105 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg10[%c1792, %c0], %120 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg8[%c1792, %c0], %119 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      }
      %62 = arith.cmpi ne, %arg3, %c0_i32 : i32
      scf.if %62 {
        %63 = vector.load %arg9[%c1792, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %64 = vector.load %arg10[%c1792, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %65 = vector.load %arg8[%c1792, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
        %66 = vector.extract_strided_slice %55 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %67 = vector.extract_strided_slice %57 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %68 = tpu.matmul %60, %66, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %69 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %70 = vector.broadcast %61 : i32 to vector<256x1024xi32>
        %71 = arith.addi %70, %69 : vector<256x1024xi32>
        %72 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %73 = vector.broadcast %2 : i32 to vector<256x1024xi32>
        %74 = arith.addi %73, %72 : vector<256x1024xi32>
        %75 = arith.cmpi sge, %71, %74 : vector<256x1024xi32>
        %76 = arith.select %75, %68, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %77 = vector.multi_reduction <maximumf>, %76, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %78 = vector.shape_cast %77 : vector<256xf32> to vector<256x1xf32>
        %79 = vector.broadcast %78 : vector<256x1xf32> to vector<256x1024xf32>
        %80 = arith.subf %76, %79 : vector<256x1024xf32>
        %81 = math.exp2 %80 : vector<256x1024xf32>
        %82 = arith.truncf %81 : vector<256x1024xf32> to vector<256x1024xbf16>
        %83 = vector.multi_reduction <add>, %81, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %84 = vector.shape_cast %83 : vector<256xf32> to vector<256x1xf32>
        %85 = tpu.matmul %82, %67, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %86 = vector.extract_strided_slice %55 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %87 = vector.extract_strided_slice %57 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
        %88 = tpu.matmul %60, %86, %cst_5 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<1024x128xbf16>, vector<256x1024xf32> -> vector<256x1024xf32>
        %89 = tpu.iota {dimensions = array<i32: 0>} : vector<256x1024xi32>
        %90 = vector.broadcast %61 : i32 to vector<256x1024xi32>
        %91 = arith.addi %90, %89 : vector<256x1024xi32>
        %92 = arith.addi %2, %c1024_i32 : i32
        %93 = tpu.iota {dimensions = array<i32: 1>} : vector<256x1024xi32>
        %94 = vector.broadcast %92 : i32 to vector<256x1024xi32>
        %95 = arith.addi %94, %93 : vector<256x1024xi32>
        %96 = arith.cmpi sge, %91, %95 : vector<256x1024xi32>
        %97 = arith.select %96, %88, %cst_0 : vector<256x1024xi1>, vector<256x1024xf32>
        %98 = vector.multi_reduction <maximumf>, %97, %cst_4 [1] : vector<256x1024xf32> to vector<256xf32>
        %99 = vector.shape_cast %98 : vector<256xf32> to vector<256x1xf32>
        %100 = vector.broadcast %99 : vector<256x1xf32> to vector<256x1024xf32>
        %101 = arith.subf %97, %100 : vector<256x1024xf32>
        %102 = math.exp2 %101 : vector<256x1024xf32>
        %103 = arith.truncf %102 : vector<256x1024xf32> to vector<256x1024xbf16>
        %104 = vector.multi_reduction <add>, %102, %cst_3 [1] : vector<256x1024xf32> to vector<256xf32>
        %105 = vector.shape_cast %104 : vector<256xf32> to vector<256x1xf32>
        %106 = tpu.matmul %103, %87, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x1024xbf16>, vector<1024x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
        %107 = arith.maximumf %78, %99 : vector<256x1xf32>
        %108 = vector.broadcast %107 : vector<256x1xf32> to vector<256x128xf32>
        %109 = arith.maximumf %63, %108 : vector<256x128xf32>
        %110 = vector.extract_strided_slice %109 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
        %111 = arith.subf %63, %109 : vector<256x128xf32>
        %112 = math.exp2 %111 : vector<256x128xf32>
        %113 = arith.subf %78, %110 : vector<256x1xf32>
        %114 = math.exp2 %113 : vector<256x1xf32>
        %115 = arith.mulf %84, %114 : vector<256x1xf32>
        %116 = arith.addf %115, %cst : vector<256x1xf32>
        %117 = vector.broadcast %114 : vector<256x1xf32> to vector<256x128xf32>
        %118 = arith.mulf %85, %117 : vector<256x128xf32>
        %119 = arith.addf %118, %cst_2 : vector<256x128xf32>
        %120 = arith.subf %99, %110 : vector<256x1xf32>
        %121 = math.exp2 %120 : vector<256x1xf32>
        %122 = arith.mulf %105, %121 : vector<256x1xf32>
        %123 = arith.addf %116, %122 : vector<256x1xf32>
        %124 = vector.broadcast %121 : vector<256x1xf32> to vector<256x128xf32>
        %125 = arith.mulf %106, %124 : vector<256x128xf32>
        %126 = arith.addf %119, %125 : vector<256x128xf32>
        %127 = arith.mulf %64, %112 : vector<256x128xf32>
        %128 = vector.broadcast %123 : vector<256x1xf32> to vector<256x128xf32>
        %129 = arith.addf %127, %128 : vector<256x128xf32>
        %130 = vector.extract_strided_slice %112 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
        %131 = vector.broadcast %130 : vector<256x1xf32> to vector<256x128xf32>
        %132 = arith.mulf %65, %131 : vector<256x128xf32>
        %133 = arith.addf %132, %126 : vector<256x128xf32>
        tpu.vector_store %arg9[%c1792, %c0], %109 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg10[%c1792, %c0], %129 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
        tpu.vector_store %arg8[%c1792, %c0], %133 {strides = array<i32>} : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      }
    }
    scf.if %1 {
      %7 = vector.load %arg10[%c0, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %8 = vector.load %arg8[%c0, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %9 = vector.broadcast %7 : vector<512x1xf32> to vector<512x128xf32>
      %10 = arith.divf %8, %9 : vector<512x128xf32>
      %11 = arith.truncf %10 : vector<512x128xf32> to vector<512x128xbf16>
      %12 = vector.shape_cast %11 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c0, %c0, %c0], %12 {strides = array<i32>} : memref<1x4x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %13 = vector.load %arg10[%c512, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %14 = vector.load %arg8[%c512, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %15 = vector.broadcast %13 : vector<512x1xf32> to vector<512x128xf32>
      %16 = arith.divf %14, %15 : vector<512x128xf32>
      %17 = arith.truncf %16 : vector<512x128xf32> to vector<512x128xbf16>
      %18 = vector.shape_cast %17 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c1, %c0, %c0], %18 {strides = array<i32>} : memref<1x4x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %19 = vector.load %arg10[%c1024, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %20 = vector.load %arg8[%c1024, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %21 = vector.broadcast %19 : vector<512x1xf32> to vector<512x128xf32>
      %22 = arith.divf %20, %21 : vector<512x128xf32>
      %23 = arith.truncf %22 : vector<512x128xf32> to vector<512x128xbf16>
      %24 = vector.shape_cast %23 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c2, %c0, %c0], %24 {strides = array<i32>} : memref<1x4x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %25 = vector.load %arg10[%c1536, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %26 = vector.load %arg8[%c1536, %c0] : memref<2048x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %27 = vector.broadcast %25 : vector<512x1xf32> to vector<512x128xf32>
      %28 = arith.divf %26, %27 : vector<512x128xf32>
      %29 = arith.truncf %28 : vector<512x128xf32> to vector<512x128xbf16>
      %30 = vector.shape_cast %29 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c3, %c0, %c0], %30 {strides = array<i32>} : memref<1x4x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
    }
    return
  }
  func.func @transform_0(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_1(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c1_i32 = arith.constant 1 : i32
    %c0_i32 = arith.constant 0 : i32
    %c4_i32 = arith.constant 4 : i32
    %0 = arith.muli %arg1, %c4_i32 : i32
    %1 = arith.divsi %0, %c4_i32 : i32
    %2 = arith.cmpi sgt, %0, %c0_i32 : i32
    %3 = arith.extui %2 : i1 to i32
    %4 = arith.cmpi slt, %0, %c0_i32 : i32
    %5 = arith.extui %4 : i1 to i32
    %6 = arith.subi %3, %5 : i32
    %7 = arith.cmpi ne, %6, %c1_i32 : i32
    %8 = arith.remsi %0, %c4_i32 : i32
    %9 = arith.cmpi ne, %8, %c0_i32 : i32
    %10 = arith.andi %7, %9 : i1
    %11 = arith.subi %1, %c1_i32 : i32
    %12 = arith.select %10, %11, %1 : i32
    return %arg0, %12, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_2(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c1_i32 = arith.constant 1 : i32
    %c0_i32 = arith.constant 0 : i32
    %c4_i32 = arith.constant 4 : i32
    %0 = arith.muli %arg1, %c4_i32 : i32
    %1 = arith.divsi %0, %c4_i32 : i32
    %2 = arith.cmpi sgt, %0, %c0_i32 : i32
    %3 = arith.extui %2 : i1 to i32
    %4 = arith.cmpi slt, %0, %c0_i32 : i32
    %5 = arith.extui %4 : i1 to i32
    %6 = arith.subi %3, %5 : i32
    %7 = arith.cmpi ne, %6, %c1_i32 : i32
    %8 = arith.remsi %0, %c4_i32 : i32
    %9 = arith.cmpi ne, %8, %c0_i32 : i32
    %10 = arith.andi %7, %9 : i1
    %11 = arith.subi %1, %c1_i32 : i32
    %12 = arith.select %10, %11, %1 : i32
    return %arg0, %12, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_3(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
}

